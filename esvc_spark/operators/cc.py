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

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def _scoped_conf(spark, key: str, value: str):
    """Temporarily set one session conf, restoring (or unsetting) the
    previous value on exit — the single save/restore implementation every
    query-scoped conf goes through."""
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@contextmanager
def _scoped_shuffle_partitions(spark, n: int | None):
    """Temporarily size shuffle partitions for the label-propagation
    rounds. The label/edge tables of a dedup graph are pair-list-sized
    (orders of magnitude below the corpus), so a session tuned for corpus
    scans — or a plain driver session at 200 — pays pure task-scheduling
    latency per round. Restored on exit; pass None to leave the session
    untouched (e.g. when the edge list really is corpus-scale)."""
    if n is None:
        yield
        return
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", str(n)):
        yield


# Below this many edges the label-propagation rounds are pure
# task-scheduling latency (~0.3 s/round × diameter): collect the edge
# list and union-find on the driver instead — identical min-labels, and
# the same small-dataset fast-path policy as the editor engine
# (queries/esvc.py). A dedup pair-graph at 100 TB corpus scale is STILL
# usually under this bound (pairs ≪ corpus); the Pregel loop below
# remains the unbounded path.
_LOCAL_EDGES = 200_000


def connected_components(
    edges: DataFrame, shuffle_partitions: int | None = 8
) -> DataFrame:
    """`edges(src BIGINT, dst BIGINT)` (undirected; duplicates fine) →
    `(doc_id, label)` where label = min node id of the component. Nodes
    are those that appear in at least one edge."""
    # Probe with a bare limit-collect, NOT a persist-then-probe: caching
    # the edge plan for the probe was measured 1.7x slower end-to-end on
    # the (overwhelmingly common) fast path — the cache write materializes
    # every touched partition fully, while CollectLimitExec's incremental
    # partition scheduling often stops early. The cost of this choice is
    # bounded and rare: only when edges exceed _LOCAL_EDGES does the slow
    # path re-derive the edge plan once more into the persisted `sym`
    # table (which every Pregel round then reuses).
    rows = edges.select("src", "dst").limit(_LOCAL_EDGES + 1).collect()
    if len(rows) <= _LOCAL_EDGES:
        return _local_cc(edges.sparkSession, rows)
    with _scoped_shuffle_partitions(edges.sparkSession, shuffle_partitions):
        return _connected_components(edges)


def _local_cc(spark, rows) -> DataFrame:
    """Driver-side union-find (path-halving) producing the same
    min-label-per-component output as the distributed loop; property-
    tested equal in tests/test_pipeline_ops.py."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r["src"], r["dst"]
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [(n, find(n)) for n in parent]
    return spark.createDataFrame(labels, "doc_id BIGINT, label BIGINT")


def _connected_components(edges: DataFrame) -> DataFrame:
    e0 = edges.select("src", "dst")
    sym = (
        e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist()
    )
    # Seed each node with min(self, direct neighbors) — one aggregation
    # that replaces the identity-init plus the entire first propagation
    # round (a join + an aggregate).
    #
    # Each round's plan references the previous round's twice
    # (labels ∪ (sym ⋈ labels)), so without lineage truncation the
    # LOGICAL plan tree doubles per round — caching shortcuts execution
    # but not analysis, and by round ~15 (a diameter-16 component) the
    # driver spends minutes in the optimizer. localCheckpoint
    # materializes the round AND truncates lineage to the materialized
    # RDD (the iterative-algorithm idiom; on a cluster with dynamic
    # allocation use checkpoint() to reliable storage instead).
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "doc_id")
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    while True:
        msgs = sym.join(labels.withColumnRenamed("doc_id", "src"), "src").select(
            F.col("dst").alias("doc_id"), "label"
        )
        new_labels = (
            labels.union(msgs).groupBy("doc_id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels
