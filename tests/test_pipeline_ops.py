"""Invariant tests for the training-pipeline operators added on top of the
dedup/similarity family (their value-level correctness is oracle-checked
via the driver contract; these pin the semantic invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from esvc_spark.queries.documents import (
    QUERIES as DOC_QUERIES,
)


def test_dup_clusters_invariants(spark, sf_dir):
    out = DOC_QUERIES["q_doc_dup_clusters"](spark, sf_dir).collect()
    assert out, "expected at least one duplicate cluster in the test corpus"
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        # representative is the minimum member and belongs to its cluster
        assert cid == ids[0]
        # every member carries the true cluster size
        assert all(m["cluster_size"] == len(members) for m in members)
        # exactly one keeper per cluster: the representative
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid
        # clusters are non-trivial (edges exist only between duplicates)
        assert len(members) >= 2


def test_sample_mixture_deterministic_and_stratified(spark, sf_dir):
    q = DOC_QUERIES["q_doc_sample_mixture"]
    a = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    assert a == b, "hash sampling must be run-to-run deterministic"
    rows = q(spark, sf_dir).collect()
    assert all(r["bucket"] < r["rate"] for r in rows)


def test_tfidf_top_terms_ranked(spark, sf_dir):
    rows = DOC_QUERIES["q_doc_tfidf_top"](spark, sf_dir).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, terms in per_doc.items():
        assert len(terms) <= 3
        ranked = sorted(terms, key=lambda r: r["rk"])
        scores = [r["score"] for r in ranked]
        assert scores == sorted(scores, reverse=True)


def test_kmv_estimate_close_to_exact(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    rows = EV_QUERIES["q_ev_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # KMV with k=64 has ~1/sqrt(62) ≈ 13% stddev; 50% is a loose
        # sanity bound that still catches a broken estimator
        assert abs(r["rel_err"]) < 0.5, (r["event_type"], r["rel_err"])


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    stream = EV_QUERIES["q_stream_tumbling_hourly"](spark, sf_dir)
    batch = (
        EV_QUERIES["q_ev_tumbling_hourly"](spark, sf_dir)
        .select("window_start", "event_type", "n_events", "sum_value")
    )
    assert stream.exceptAll(batch).isEmpty()
    assert batch.exceptAll(stream).isEmpty()


def test_connected_components_property(spark):
    """Spark min-label CC equals a pure-Python union-find on random edge
    lists (bounded sizes keep each case to a couple of Spark rounds)."""
    import random

    from esvc_spark.operators.cc import connected_components

    rng = random.Random(1234)
    for _ in range(5):
        n = rng.randint(2, 30)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(1, 40))
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: min(y for y in touched if find(y) == find(x)) for x in touched}

        df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
        got = {
            r["doc_id"]: r["label"]
            for r in connected_components(df).collect()
        }
        assert got == want
