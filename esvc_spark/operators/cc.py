"""Connected components by min-label propagation — the Pregel-style CC
used for duplicate clustering (and any other pair-graph grouping).

Each round is one equality join (edges ⋈ labels, bounded by |E|) plus a
map-side-combined min-aggregate; rounds ≈ component diameter. The edges
input is symmetrized and co-partitioned on the join key once, so per-round
shuffle traffic is only the (smaller) label side. Convergence is detected
with a monotone aggregate — sum(label) strictly decreases until fixpoint —
instead of a change-join, one cheap job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame) -> DataFrame:
    """`edges(src BIGINT, dst BIGINT)` (undirected; duplicates fine) →
    `(doc_id, label)` where label = min node id of the component. Nodes
    are those that appear in at least one edge."""
    e0 = edges.select("src", "dst")
    sym = (
        e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist()
    )
    # Seed each node with min(self, direct neighbors) — one aggregation
    # that replaces the identity-init plus the entire first propagation
    # round (a join + an aggregate).
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "doc_id")
        .persist()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    while True:
        msgs = sym.join(labels.withColumnRenamed("doc_id", "src"), "src").select(
            F.col("dst").alias("doc_id"), "label"
        )
        new_labels = (
            labels.union(msgs).groupBy("doc_id").agg(F.min("label").alias("label"))
        ).persist()
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels
