"""Per-query Spark JOB census (round 12, guide §1): run a query and
report how many jobs it issued, with per-job wall time and description —
the instrument for job-floor-bound queries (ANN maintenance, esvc
shelve loops, streaming), where the cost is scheduling floors x job
count, not bytes.

Usage:
    python scripts/job_census.py q_name[,q_name...] [--sf-dir DIR] [--n 1]
        [--top 15]

Uses the driver's AppStatusStore via py4j (works with spark.ui.enabled
false) — jobs are counted between markers, durations come from the
store's completion times.
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


def _jobs(spark):
    """All jobs from the AppStatusStore: [(job_id, desc, dur_sec)]."""
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        st = j.submissionTime()
        ct = j.completionTime()
        dur = None
        if st.isDefined() and ct.isDefined():
            dur = (ct.get().getTime() - st.get().getTime()) / 1000.0
        desc = j.description()
        out.append(
            (
                j.jobId(),
                desc.get() if desc.isDefined() else j.name(),
                dur,
            )
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    spark = get_spark(
        "esvc-job-census",
        extra_conf={"spark.ui.retainedJobs": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    for name in names:
        fn = queries[name]
        for i in range(args.n):
            before_ids = {j[0] for j in _jobs(spark)}
            spark.sparkContext.setJobDescription(f"{name} census #{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            wall = time.perf_counter() - t0
            time.sleep(0.3)  # let the status store drain its event queue
            new = [j for j in _jobs(spark) if j[0] not in before_ids]
            release_between_queries(spark)
            new.sort(key=lambda j: j[0])
            tot = sum(j[2] or 0.0 for j in new)
            print(
                f"{name} run#{i}: wall={wall:.2f}s jobs={len(new)} "
                f"job_time_sum={tot:.2f}s"
            )
            by_dur = sorted(new, key=lambda j: -(j[2] or 0.0))[: args.top]
            for jid, desc, dur in by_dur:
                d = (desc or "").replace("\n", " ")[:110]
                print(f"   job {jid:>5}  {dur if dur is not None else -1:6.2f}s  {d}")
    spark.stop()


if __name__ == "__main__":
    main()
