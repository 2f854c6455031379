"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join, composed from shuffles + windows so they scale.

as-of join — "for each left row, the latest right row with
right.ts <= left.ts per key" — is NOT a Spark builtin (Catalyst would
plan the naive formulation as a nested-loop or an exploding inequality
join). The scalable composition: union both sides tagged, one shuffle on
the key, one ordered window pass carrying the last non-null right value
forward. Cost = sort-merge on (key, ts): exactly one shuffle of N+M rows
— the same shape pandas merge_asof / kdb aj use, distributed.

range join ("pairs within a bounded time distance") uses bucketized
equality pre-joins: each row lands in its interval bucket, candidates
come from equality on (key, bucket) x {bucket, bucket+1}, then the exact
predicate filters. Shuffle volume is O(rows x 2) instead of the O(N^2)
nested loop Catalyst falls back to for pure inequality conditions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    right_on: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the `value_cols` of the most
    recent right row (right.ts <= left.ts) with equal `by` keys; null if
    none. `right` must be unique per (by, on) — pre-aggregate it if not,
    or the carried value is nondeterministic.

    One shuffle (on `by`), one window sort — no inequality join blowup.
    """
    ron = right_on or on
    rt = right.select(
        *by, F.col(ron).alias(on), *[F.col(c) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    lt = left.withColumn("_side", F.lit(1))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal ts, so an exact
    # ts tie matches (<= semantics, like DuckDB ASOF and pandas merge_asof)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out_cols = left.columns + value_cols
    return unioned.filter(F.col("_side") == 1).select(*out_cols)


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    right_on: str | None = None,
) -> DataFrame:
    """Nearest as-of join: every left row gains the `value_cols` of the
    right row minimizing |right.on − left.on| within equal `by` keys
    (ties → the backward/earlier side), plus `matched_on` and
    `direction` ('backward'/'forward', null when no right row exists).
    `on` must be NUMERIC (pass unix_micros for timestamps) so the
    distance compare is exact integer arithmetic.

    Same scale shape as asof_join — one shuffle on `by`, one sorted
    window pass run in both directions — instead of the |L|·|R|
    inequality join a naive min-|Δt| formulation plans to.
    """
    ron = right_on or on
    rt = right.select(
        *by, F.col(ron).alias(on), *[F.col(c) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    lt = left.withColumn("_side", F.lit(1))
    # carry (ts, values) as ONE struct so the window's ignorenulls skip
    # can never mix the nearest row's timestamp with a different row's
    # value (a right row with a NULL value column would otherwise make
    # last/first skip that column independently per field)
    u = lt.unionByName(rt, allowMissingColumns=True).withColumn(
        "_rrow",
        F.when(
            F.col("_side") == 0,
            F.struct(F.col(on).alias("_ts"), *[F.col(c) for c in value_cols]),
        ),
    )
    # right rows sort before left at equal `on` in the backward pass and
    # after left in the forward pass, so an exact tie is visible to both
    # directions at distance 0 (and backward wins the tie-break below)
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn("_b", F.last("_rrow", ignorenulls=True).over(wb))
    u = u.withColumn("_f", F.first("_rrow", ignorenulls=True).over(wf))
    use_b = F.col("_f._ts").isNull() | (
        F.col("_b._ts").isNotNull()
        & ((F.col(on) - F.col("_b._ts")) <= (F.col("_f._ts") - F.col(on)))
    )
    out = u.filter(F.col("_side") == 1).withColumn(
        "matched_on",
        F.when(use_b, F.col("_b._ts")).otherwise(F.col("_f._ts")),
    )
    for c in value_cols:
        out = out.withColumn(
            c, F.when(use_b, F.col(f"_b.{c}")).otherwise(F.col(f"_f.{c}"))
        )
    out = out.withColumn(
        "direction",
        F.when(F.col("matched_on").isNull(), F.lit(None).cast("string"))
        .when(use_b, F.lit("backward"))
        .otherwise(F.lit("forward")),
    )
    return out.select(*left.columns, *value_cols, "matched_on", "direction")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """Bounded-distance pair join: rows with equal `by` keys whose `on`
    timestamps satisfy lower_us <= right.on - left.on <= upper_us
    (microseconds). Implemented as equality joins on (by, time-bucket)
    against bucket and bucket+1 with bucket size = upper_us, then the
    exact filter — turning an inequality join (nested-loop in Catalyst)
    into two co-partitioned equality joins with O(rows x 2) shuffle.

    Result columns: the left columns as-is, the right columns suffixed
    `_r`, plus `_gap_us` (right.on - left.on in microseconds).
    """
    assert upper_us > 0 and 0 <= lower_us <= upper_us
    bucket = upper_us
    rb = right
    for c in right.columns:
        rb = rb.withColumnRenamed(c, f"{c}_r")
    lb = left.withColumn("_bkt", (F.unix_micros(F.col(on)) / bucket).cast("long"))
    rb = rb.withColumn(
        "_bkt_r", (F.unix_micros(F.col(f"{on}_r")) / bucket).cast("long")
    )
    pairs = None
    for shift in (0, 1):
        cand = lb.join(
            rb,
            [
                *[F.col(k) == F.col(f"{k}_r") for k in by],
                F.col("_bkt") + shift == F.col("_bkt_r"),
            ],
        )
        pairs = cand if pairs is None else pairs.unionByName(cand)
    gap = F.unix_micros(F.col(f"{on}_r")) - F.unix_micros(F.col(on))
    return (
        pairs.withColumn("_gap_us", gap)
        .filter((F.col("_gap_us") >= lower_us) & (F.col("_gap_us") <= upper_us))
        .drop("_bkt", "_bkt_r")
    )
