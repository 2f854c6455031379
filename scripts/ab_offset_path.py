"""One-shot A/B (VERDICT r5 next-round #6): q_esvc_editor_large's offset
table via the two-phase exclusive_prefix_sum (r5 code) vs the old
single-window plan (local=True), in ONE process, min-of-N each, at sf0.1
— the only way to read a difference through this host's noisy-neighbor
swings. The offsets table is |documents| rows (tiny at test sf; the
two-phase path exists for the 100 TB shape where a single-task window is
the scale-killer), so the question is only whether the small-sf fixed
cost is worth a size-conditional local path.

Usage: python scripts/ab_offset_path.py [sf_dir] [n_rounds]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

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

    # interleave A/B so a noise burst hits both arms equally
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
