"""One-shot A/B (VERDICT r5 next-round #6): q_esvc_editor_large's offset
table via the two-phase exclusive_prefix_sum (r5 code) vs the old
single-window plan (local=True), in ONE process, min-of-N each, at sf0.1
— the only way to read a difference through this host's noisy-neighbor
swings. The offsets table is |documents| rows (tiny at test sf; the
two-phase path exists for the 100 TB shape where a single-task window is
the scale-killer), so the question is only whether the small-sf fixed
cost is worth a size-conditional local path.

Round 7 adds a second arm behind `--join`: the offsets-onto-words join
as a broadcast vs a doc_id-partitioned shuffled hash join — the
measurement behind `_ED_OFFS_BROADCAST_DOCS` (the size-conditional
swap that closes the r6 "~10⁸-doc broadcast cap" seam in
queries/esvc.py:_word_lines).

Usage: python scripts/ab_offset_path.py [--join] [sf_dir] [n_rounds]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--join"]
    join_mode = "--join" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n = int(args[1]) if len(args) > 1 else 5

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from esvc_spark.catalog import table as T
    from esvc_spark.core.spark_engine import exclusive_prefix_sum

    def counts():
        return (
            T(spark, sf_dir, "documents")
            .select("doc_id", F.split("text", " ").alias("w"))
            .repartition(8, "doc_id")
            .select("doc_id", F.size("w").cast("bigint").alias("nw"))
        )

    def run(local: bool) -> float:
        t0 = time.perf_counter()
        exclusive_prefix_sum(
            spark, counts(), ["doc_id"], "nw", "off", local=local
        ).select("doc_id", "off").count()
        return time.perf_counter() - t0

    def run_join(broadcast: bool) -> float:
        docs = (
            T(spark, sf_dir, "documents")
            .select("doc_id", F.split("text", " ").alias("w"))
            .repartition(8, "doc_id")
        )
        offs = exclusive_prefix_sum(
            spark,
            docs.select("doc_id", F.size("w").cast("bigint").alias("nw")),
            ["doc_id"],
            "nw",
            "off",
            local=True,
        ).select("doc_id", "off")
        t0 = time.perf_counter()
        joined = (
            docs.join(F.broadcast(offs), "doc_id")
            if broadcast
            else docs.join(offs.repartition(8, "doc_id"), "doc_id")
        )
        joined.select(
            "off", F.posexplode("w").alias("wi", "text")
        ).select((F.col("off") + F.col("wi")).alias("line_no")).count()
        return time.perf_counter() - t0

    # interleave A/B so a noise burst hits both arms equally
    if join_mode:
        bcast, hashj = [], []
        run_join(True)
        run_join(False)  # warm both paths once
        for _ in range(n):
            bcast.append(run_join(True))
            hashj.append(run_join(False))
        print(f"broadcast  min={min(bcast):.3f}s all={[round(x, 3) for x in bcast]}")
        print(f"hash_join  min={min(hashj):.3f}s all={[round(x, 3) for x in hashj]}")
        spark.stop()
        return
    two_phase, single_window = [], []
    run(True)
    run(False)  # warm both paths once
    for _ in range(n):
        two_phase.append(run(False))
        single_window.append(run(True))
    print(f"two_phase   min={min(two_phase):.3f}s all={[round(x, 3) for x in two_phase]}")
    print(f"single_win  min={min(single_window):.3f}s all={[round(x, 3) for x in single_window]}")
    spark.stop()


if __name__ == "__main__":
    main()
