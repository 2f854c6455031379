"""Partition-parallel per-group top-k.

The brute-force ANN audit arms score |corpus| x |queries| rows and keep
each query's best k. A plain `row_number().over(Window.partitionBy(
query_id).orderBy(...))` funnels each query's WHOLE scored set through
one task — with 20 queries that is a 20-task stage over corpus-scale
data, the first thing that dies at 1e9 vectors. `topk_per_group` is the
classic two-phase top-k, fully declarative (no checkpoints, no driver
collects):

1. local pass — rank within (group, input-partition) and keep k: every
   input partition contributes its best k rows per group, in parallel;
2. global pass — the surviving <= groups x partitions x k rows (tiny)
   go through the exact per-group rank window.

The global top-k of the local top-ks IS the global top-k (any row in
the true top-k is within its own partition's top-k), and ties are
pinned by the caller's total-order `order_cols`, so the result is
byte-identical to the single-window formulation regardless of how the
input happens to be partitioned — asserted by
tests/test_spark_core.py's differential test and by the unchanged
determinism-probe hashes of every converted query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """`df` reduced to each group's top `k` rows in `order_cols` order,
    plus `rank_col` (1-based int, same type as row_number). `order_cols`
    must be a total order within each group or ties fall arbitrarily on
    partition boundaries."""
    wl = Window.partitionBy(
        *group_cols, F.spark_partition_id()
    ).orderBy(*order_cols)
    cand = (
        df.withColumn("_lr", F.row_number().over(wl))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    wg = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return cand.withColumn(rank_col, F.row_number().over(wg)).filter(
        F.col(rank_col) <= k
    )
