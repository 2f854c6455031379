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

Round 8 adds `--helpers`: the measurement behind
core.spark_engine.TWO_PHASE_MIN_ROWS — local single-window vs two-phase
for global_row_number AND grouped_row_number over synthetic frames of
1e4 / 1e5 / 1e6 / 4e6 rows, interleaved min-of-N in one process. The
gate exists because the two-phase machinery pays a fixed
repartitionByRange + DISK_ONLY checkpoint + offsets-collect cost that a
few-thousand-row ranked frame never amortizes (VERDICT r7 #1: the 15
round-7 rewrites cost 18.6 → 34.5 s at sf0.1).

Usage: python scripts/ab_offset_path.py [--join|--helpers] [sf_dir] [n_rounds]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _helpers_ab(spark, n_rounds: int) -> None:
    import time

    from pyspark.sql import functions as F

    from esvc_spark.core.spark_engine import (
        global_row_number,
        grouped_row_number,
    )

    def frame(n: int, groups: int = 16):
        # unique scrambled order key (odd multiplier mod 2^63 is a
        # bijection) + a `groups`-ary group key
        return spark.range(n).select(
            (F.col("id") * F.lit(2654435761) % F.lit(1 << 62)).alias("k"),
            (F.col("id") % groups).cast("int").alias("g"),
        )

    def force(df, out: str) -> float:
        t0 = time.perf_counter()
        # aggregate OVER the rank column so Catalyst cannot prune the
        # window (a bare count() would)
        df.agg(F.sum(out)).collect()
        return time.perf_counter() - t0

    for n in (10_000, 100_000, 1_000_000, 4_000_000):
        for name, run in (
            (
                "global",
                lambda loc: force(
                    global_row_number(spark, frame(n), ["k"], "rn", local=loc),
                    "rn",
                ),
            ),
            (
                "grouped",
                lambda loc: force(
                    grouped_row_number(
                        spark, frame(n), ["g"], ["k"], "rn", local=loc
                    ),
                    "rn",
                ),
            ),
            (
                # the max_group_rows policy's shape: FEW balanced groups
                # (zonemap/zorder are 3 layout copies of one table) — the
                # local window's task count collapses to |groups|, so
                # this is its worst case short of a single group
                "grouped3",
                lambda loc: force(
                    grouped_row_number(
                        spark, frame(n, groups=3), ["g"], ["k"], "rn",
                        local=loc,
                    ),
                    "rn",
                ),
            ),
        ):
            run(True)
            run(False)  # warm both paths
            loc, two = [], []
            for _ in range(n_rounds):
                loc.append(run(True))
                two.append(run(False))
            print(
                f"n={n:>9,} {name:7s} local min={min(loc):.3f}s "
                f"two_phase min={min(two):.3f}s "
                f"(all local={[round(x, 2) for x in loc]} "
                f"two={[round(x, 2) for x in two]})"
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--join", "--helpers")]
    join_mode = "--join" in sys.argv[1:]
    helpers_mode = "--helpers" in sys.argv[1:]
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

    if helpers_mode:
        _helpers_ab(spark, n)
        spark.stop()
        return

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
