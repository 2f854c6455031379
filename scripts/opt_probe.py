"""Round-11 optimization probe: isolate queries with the noop sink and
capture formatted plans (guide §1).

Usage:
    python scripts/opt_probe.py q_name[,q_name...] [--sf-dir DIR] [--n 3]
        [--plans-out plans/r11 --suffix before] [--count]

For each query: runs it N times against the noop sink (computes every
column, discards output — guide §1.4), prints per-run seconds and the
min, and (with --plans-out) writes `.explain("formatted")` to
<plans-out>/<query>_<suffix>.txt. `--count` additionally times the
bench's own action (`.count()`) for comparability with BENCH_FULL.

Driver-comparable env: same get_spark factory and between-query hygiene
as bench.py; jobs labeled via setJobDescription.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esvc_spark.queries import all_queries  # noqa: E402
from esvc_spark.queries._util import release_between_queries  # noqa: E402
from esvc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--count", action="store_true")
    args = ap.parse_args()

    spark = get_spark("esvc-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    for name in names:
        fn = queries[name]
        times, counts = [], []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} noop #{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            if args.count:
                spark.sparkContext.setJobDescription(f"{name} count #{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).count()
                counts.append(time.perf_counter() - t0)
            release_between_queries(spark)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_out, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            release_between_queries(spark)
        msg = (
            f"{name}: noop {[round(t, 3) for t in times]}"
            f" min={min(times):.3f}"
        )
        if counts:
            msg += f" | count {[round(t, 3) for t in counts]} min={min(counts):.3f}"
        print(msg, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
