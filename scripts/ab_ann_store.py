"""One-shot A/B for operators/ann_store.py's pruning claim: serve the
same IVF query batch from (a) the cell-PARTITIONED layout with the
probe pushed as a partition filter vs (b) the same rows in a flat
(unpartitioned) layout where the probe is a post-scan filter — in ONE
process, interleaved min-of-N, on the sf embeddings table. Also prints
the file-count evidence (how many of the k cell directories the pruned
scan actually opens).

At test scale the corpus is tiny (5000 rows at sf0.1), so wall-clock
parity (or a small partitioned-side penalty from listing k directories
instead of one) is the EXPECTED reading — the receipt's point is the
file-count evidence: the pruned probe opens nprobe of k cell files
while the flat layout must open all of them, and at 100 TB "files never
opened" is the whole game. Run:

    python scripts/ab_ann_store.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from esvc_spark.operators.ann_store import IVFIndexStore  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("ab-ann-store")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    work = tempfile.mkdtemp(prefix="ab_ann_")
    try:
        store = IVFIndexStore.build(spark, emb, os.path.join(work, "idx"), k=8)
        # flat twin: same assigned rows, no partitioning
        store.cells().write.mode("overwrite").parquet(
            os.path.join(work, "flat")
        )
        flat = lambda: spark.read.parquet(os.path.join(work, "flat"))  # noqa: E731
        queries = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "emb"
        )

        def flat_search() -> int:
            # identical query, flat candidate source: the cells_df seam
            # keeps both arms on the OPERATOR's own search logic so the
            # twins cannot drift (review finding, round 8)
            return store.search(queries, nprobe=2, topk=3, cells_df=flat()).count()

        # file-count evidence: which files does the pruned probe open?
        # (df.inputFiles() lists the UNPRUNED index; input_file_name()
        # during the actual read counts what the scan touched)
        pruned = store.cells().filter(F.col("cell").isin([0, 3]))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan
        n_read = pruned.select(F.input_file_name()).distinct().count()
        n_all = (
            store.cells().select(F.input_file_name()).distinct().count()
        )
        print(
            f"pruned probe opens {n_read} of {n_all} cell files "
            f"(PartitionFilters in plan: yes)"
        )

        t_part, t_flat = [], []
        for _ in range(rounds):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n1 = store.search(queries, nprobe=2, topk=3).count()
            t_part.append(time.monotonic() - t0)
            t0 = time.monotonic()
            n2 = flat_search()
            t_flat.append(time.monotonic() - t0)
            assert n1 == n2, (n1, n2)
        print(
            f"partitioned(pruned) min={min(t_part):.3f}s  "
            f"flat(post-scan filter) min={min(t_flat):.3f}s  rounds={rounds}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
