"""Warm in-process phase profile of the ANN-store query pipelines
(round 12, guide §1): replicate q_stream_emb_index / q_emb_ivf_split /
q_emb_ivfpq_store / q_emb_ivf_merge phase by phase with job-description
markers, and report wall seconds + JOB COUNT per phase from the
AppStatusStore. The queries are job-floor bound at sf0.1 (2000-row
corpus), so job count is the lever (VERDICT r11 #1/#2).

Usage:
    python scripts/ann_phase_profile.py split|stream|pqstore|merge
        [--sf-dir DIR] [--n 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from esvc_spark.queries._util import release_between_queries  # noqa: E402
from esvc_spark.session import get_spark  # noqa: E402

_IVF_K, _N_QUERIES, _NPROBE, _TOPK = 8, 20, 2, 3
_PQ_CODES, _PQ_SUBS = 16, 8


def _job_count(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    n = 0
    last = -1
    while it.hasNext():
        j = it.next()
        n += 1
        last = max(last, j.jobId())
    return last


class Phaser:
    def __init__(self, spark):
        self.spark = spark
        self.rows = []

    def run(self, name, fn):
        time.sleep(0.2)
        j0 = _job_count(self.spark)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        time.sleep(0.2)
        j1 = _job_count(self.spark)
        self.rows.append((name, dt, j1 - j0))
        return out

    def report(self, tag):
        tot = sum(r[1] for r in self.rows)
        jobs = sum(r[2] for r in self.rows)
        print(f"== {tag}: wall={tot:.2f}s jobs={jobs}")
        for name, dt, nj in self.rows:
            print(f"   {dt:6.2f}s  {nj:3d} jobs  {name}")
        self.rows = []


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def profile_split(spark, sf_dir):
    from esvc_spark.operators.ann_store import IVFIndexStore

    p = Phaser(spark)
    e = _emb(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    work = tempfile.mkdtemp(prefix="esvc_prof_split_")
    try:
        store = p.run(
            "build",
            lambda: IVFIndexStore.build(
                spark, e, f"{work}/idx", centroids=cents
            ),
        )
        counts = p.run(
            "cell counts", lambda: store.cells().groupBy("cell").count().collect()
        )
        hot, n_hot = max(
            ((int(r["cell"]), int(r["count"])) for r in counts),
            key=lambda t: (t[1], -t[0]),
        )
        old_cents = p.run(
            "old_cents ckpt", lambda: store.centroids().localCheckpoint()
        )
        new_id = p.run(
            "new_id collect",
            lambda: max(
                r["cent_id"] for r in old_cents.select("cent_id").collect()
            )
            + 1,
        )
        pre = p.run(
            "pre search",
            lambda: store.search(q, nprobe=_NPROBE, topk=_TOPK).localCheckpoint(),
        )
        p.run("split_cell", lambda: store.split_cell(hot, n_sub=2))
        post = p.run(
            "post search",
            lambda: store.search(
                q,
                nprobe=_NPROBE,
                topk=_TOPK,
                centroids_df=old_cents,
                probe_map={hot: (hot, int(new_id))},
            ).localCheckpoint(),
        )
        p.run(
            "sub_counts",
            lambda: store.cells()
            .filter(F.col("cell").isin([hot, int(new_id)]))
            .groupBy("cell")
            .count()
            .collect(),
        )
        from collections import Counter

        p.run(
            "mismatch compare",
            lambda: Counter(map(tuple, pre.collect()))
            == Counter(map(tuple, post.collect())),
        )
        p.run("final count", lambda: post.count())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return p


def profile_merge(spark, sf_dir):
    from esvc_spark.operators.ann_store import IVFIndexStore

    p = Phaser(spark)
    e = _emb(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    work = tempfile.mkdtemp(prefix="esvc_prof_merge_")
    try:
        store = p.run(
            "build",
            lambda: IVFIndexStore.build(
                spark, e, f"{work}/idx", centroids=cents
            ),
        )
        k0 = store.k
        counts = p.run(
            "cell counts",
            lambda: {
                int(r["cell"]): int(r["count"])
                for r in store.cells().groupBy("cell").count().collect()
            },
        )
        cold = sorted(counts, key=lambda c: (counts[c], c))[:2]
        a, b = int(min(cold)), int(max(cold))
        pre = p.run(
            "pre exhaustive search",
            lambda: store.search(q, nprobe=k0, topk=_TOPK).localCheckpoint(),
        )
        p.run("merge_cells", lambda: store.merge_cells(a, b))
        post_x = p.run(
            "post exhaustive search",
            lambda: store.search(q, nprobe=store.k, topk=_TOPK),
        )
        from collections import Counter

        p.run(
            "mismatch compare",
            lambda: Counter(map(tuple, pre.collect()))
            == Counter(map(tuple, post_x.collect())),
        )
        p.run(
            "n_merged count",
            lambda: store.cells().filter(F.col("cell") == a).count(),
        )
        post = p.run(
            "post search", lambda: store.search(q, nprobe=_NPROBE, topk=_TOPK)
        )
        p.run("final ckpt+count", lambda: post.localCheckpoint().count())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return p


def profile_pqstore(spark, sf_dir):
    from esvc_spark.operators.ann_store import (
        IVFIndexStore,
        _pq_parts_of,
        _unit,
    )
    from esvc_spark.functions.vectors import norm

    p = Phaser(spark)
    e = _emb(spark, sf_dir)
    en = e.withColumn("nrm", norm(F.col("emb")))
    dim_probe = len(e.select("emb").limit(1).collect()[0]["emb"])
    subdim = dim_probe // _PQ_SUBS
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )
    book = _pq_parts_of(
        en.filter(F.col("vec_id") < _PQ_CODES).select(
            "vec_id", _unit(F.col("emb"), F.col("nrm")).alias("_u")
        ),
        F.col("_u"),
        _PQ_SUBS,
        subdim,
        ["vec_id"],
    ).select(
        F.col("vec_id").cast("int").alias("code"),
        "sub",
        F.col("part").alias("cpart"),
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    work = tempfile.mkdtemp(prefix="esvc_prof_pqstore_")
    try:
        store = p.run(
            "build(pq)",
            lambda: IVFIndexStore.build(
                spark,
                e,
                f"{work}/idx",
                centroids=cents,
                pq_book=book,
                pq_m=_PQ_SUBS,
            ),
        )
        adc = p.run(
            "search_pq",
            lambda: store.search_pq(q, nprobe=_NPROBE, topk=3, rerank=4).localCheckpoint(),
        )
        exact = p.run(
            "exact search", lambda: store.search(q, nprobe=_NPROBE, topk=3)
        )
        hits = (
            adc.select("query_id", "neighbor_id")
            .join(
                exact.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        )
        p.run(
            "hits join + final",
            lambda: adc.join(hits, "query_id", "left")
            .select("query_id", "neighbor_id", "rank")
            .localCheckpoint()
            .count(),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return p


def profile_stream(spark, sf_dir):
    from esvc_spark.operators.ann_store import IVFIndexStore
    from esvc_spark.streaming.pipelines import index_embeddings_stream
    from esvc_spark.queries.events_temporal import _bounded_stream_confs

    p = Phaser(spark)
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = raw.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cents = emb.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )
    half = emb.agg((F.max("vec_id") / 2).cast("bigint").alias("h")).collect()[
        0
    ]["h"]
    work = tempfile.mkdtemp(prefix="esvc_prof_stream_")
    try:
        with _bounded_stream_confs(spark):
            store = p.run(
                "build(half)",
                lambda: IVFIndexStore.build(
                    spark,
                    emb.filter(F.col("vec_id") <= half),
                    f"{work}/idx",
                    centroids=cents,
                ),
            )
            stream = (
                spark.readStream.schema(raw.schema)
                .parquet(f"{sf_dir}/embeddings.parque*")
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("emb"),
                )
            )
            for attempt in ("first", "redelivery"):
                p.run(
                    f"stream {attempt}",
                    lambda a=attempt: index_embeddings_stream(
                        stream, store, f"{work}/ckpt_{a}"
                    ),
                )
            p.run("compact_cells", lambda: store.compact_cells())
            p.run(
                "final agg",
                lambda: store.cells()
                .groupBy(F.col("cell").cast("bigint").alias("cell"))
                .agg(
                    F.count(F.lit(1)).alias("n_vecs"),
                    F.bit_xor("vec_id").alias("id_xor"),
                    F.min("vec_id").alias("min_id"),
                    F.max("vec_id").alias("max_id"),
                )
                .localCheckpoint()
                .count(),
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return p


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["split", "stream", "pqstore", "merge"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        "esvc-ann-profile", extra_conf={"spark.ui.retainedJobs": "20000"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = {
        "split": profile_split,
        "stream": profile_stream,
        "pqstore": profile_pqstore,
        "merge": profile_merge,
    }[args.which]
    for i in range(args.n):
        p = fn(spark, args.sf_dir)
        p.report(f"{args.which} run#{i}")
        release_between_queries(spark)
    spark.stop()


if __name__ == "__main__":
    main()
