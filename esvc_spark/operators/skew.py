"""Skew mitigation for shuffles AQE can't fix.

AQE's skew-join splitting (on in session.py) handles sort-merge joins by
splitting oversized partitions at runtime — but it cannot help when the
skew sits under an aggregation with expensive per-group state, or when a
single hot key floods one task in a hash-partitioned stage. These
operators implement the classic salting decompositions:

  * `salted_join`: spread a skewed LEFT side over `n_salts` sub-keys and
    replicate the (smaller) right side once per salt — shuffle volume
    grows by |right| x n_salts, but the hot key's rows fan out over
    n_salts tasks instead of one straggler.
  * `salted_distinct_count`: two-stage exact COUNT(DISTINCT v) per key —
    stage 1 dedups (key, v) spread across (key, salt-of-v) partitions,
    stage 2 sums partial distinct counts. The hot key's distinct-set never
    assembles in one task's memory.

Salts are deterministic (xxhash64 of the salted-side payload), keeping
results replay-stable (SURVEY.md: determinism is pervasive in the esvc
model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `left` has heavily skewed join keys. The left side
    gains a deterministic salt in [0, n_salts); the right side is
    replicated once per salt value; the join adds `_salt` to the key so
    each hot key spreads over n_salts shuffle partitions."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins only")
    non_key = [c for c in left.columns if c not in on] or on
    lsalt = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts))
    )
    rsalt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return lsalt.join(rsalt, [*on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value), skew-safe: partial dedup on
    (key, salt(value)) so no single task holds a hot key's full distinct
    set, then sum of partial cardinalities (correct because the salt is a
    function of the value: equal values land in the same salt)."""
    salted = df.select(
        key, value, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    )
    partial = (
        salted.groupBy(key, "_salt")
        .agg(F.count_distinct(F.col(value)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_distinct"))
