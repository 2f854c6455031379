"""Persisted IVF index (operators/ann_store.py): build-once/serve-many
must (a) reproduce the rebuild-every-run contract query bit-for-bit,
(b) prune the probed cells at the SCAN (PartitionFilters, not a
post-scan Filter), and (c) serve from a fresh load with no rebuild."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from esvc_spark.operators.ann_store import IVFIndexStore
from esvc_spark.queries.embeddings import (
    _IVF_NPROBE,
    _IVF_TOPK,
    _N_QUERIES,
    q_emb_ivf_knn,
)


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    path = str(tmp_path_factory.mktemp("ivf_index"))
    return IVFIndexStore.build(spark, emb, path, k=8)


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in df.collect()
    )


def test_search_matches_contract_query(spark, sf_dir, store):
    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    got = _rows(store.search(queries, nprobe=_IVF_NPROBE, topk=_IVF_TOPK))
    want = _rows(q_emb_ivf_knn(spark, sf_dir))
    assert got == want


def test_probe_is_partition_pruned(store):
    pruned = store.cells().filter(F.col("cell").isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_fresh_load_serves_without_rebuild(spark, sf_dir, store):
    reloaded = IVFIndexStore.load(spark, store.path)
    assert reloaded.k == 8
    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    a = _rows(store.search(queries, nprobe=2, topk=3))
    b = _rows(reloaded.search(queries, nprobe=2, topk=3))
    assert a == b and len(a) > 0
