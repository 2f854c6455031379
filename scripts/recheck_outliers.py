"""Quiet-host min-of-N recheck of bench anchor outliers (VERDICT r9 #1).

A per-round bench run on a noisy host can leave queries reading several
times their all-time floor even after its bounded re-run budget (r9
left five). This script settles each named query with N in-process
interleaved samples against its BENCH_ANCHOR.json floor — interleaved
round-robin, not per-query blocks, so a noise burst cannot hit all
samples of one query — and prints a JSON verdict per query:

    python scripts/recheck_outliers.py [--n 3] [q_name ...]

Default query list: the current BENCH_FULL.json anchor_outliers.
A query whose min-of-N lands <= 1.5x its anchor is `noise`; anything
still above is `real` and needs a plan-level look. Mins that beat the
anchor lower it (same monotone-floor rule bench.py applies).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    with open(os.path.join(REPO, "BENCH_ANCHOR.json")) as fh:
        anchor_doc = json.load(fh)
    # anchors are per-SF: comparing (or lowering!) the sf0.1 floors with
    # a run at any other sf would both void the verdicts and permanently
    # poison the monotone anchor file (same guard bench.py applies)
    import re

    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    run_sf = float(m.group(1)) if m else None
    if anchor_doc.get("sf") != run_sf:
        print(
            json.dumps(
                {
                    "verdict": "sf mismatch: anchors are for "
                    f"sf={anchor_doc.get('sf')}, run is sf={run_sf}; "
                    "refusing to compare or lower anchors"
                }
            )
        )
        return 2
    anchor = anchor_doc.get("queries", {})

    names = args.queries
    if not names:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
            names = [o["query"] for o in json.load(fh).get("anchor_outliers", [])]
    if not names:
        print(json.dumps({"verdict": "no outliers to recheck"}))
        return 0

    from esvc_spark.queries import all_queries
    from esvc_spark.queries._util import release_between_queries
    from esvc_spark.session import get_spark

    spark = get_spark("recheck-outliers")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, args.sf_dir).count()
        dt = time.perf_counter() - t0
        # the SAME hygiene bench.py applies — the anchors these samples
        # are judged against were recorded under it
        release_between_queries(spark)
        return dt

    # one untimed warm-up of the first query primes JVM/codegen/footers
    run_once(names[0])

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.n):  # interleaved: noise bursts spread across queries
        for n in names:
            samples[n].append(run_once(n))

    results = []
    anchor_lowered = False
    lowered_names: list[str] = []
    for n in names:
        best = round(min(samples[n]), 4)
        a = anchor.get(n)
        x = round(best / a, 2) if a else None
        results.append(
            {
                "query": n,
                "min_of_n": best,
                "samples": [round(s, 3) for s in samples[n]],
                "anchor": a,
                "x_anchor": x,
                "verdict": (
                    "noise" if x is not None and x <= 1.5 else
                    "real" if x is not None else "no-anchor"
                ),
            }
        )
        if a is not None and best < a:
            anchor[n] = best
            lowered_names.append(n)
            anchor_lowered = True
    if anchor_lowered and anchor_doc.get("sf") is not None:
        anchor_doc["queries"] = {k: round(v, 4) for k, v in sorted(anchor.items())}
        # stamp provenance on every lowered floor (same schema bench.py
        # writes): a later outlier receipt shows WHICH run set the floor
        import datetime
        import subprocess

        try:
            head7 = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=REPO, timeout=30,
            ).stdout.strip()
        except Exception:
            head7 = ""
        prov = anchor_doc.get("provenance", {}) or {}
        for n in lowered_names:
            prov[n] = {
                "git": head7,
                "date": datetime.date.today().isoformat(),
            }
        anchor_doc["provenance"] = {k: prov[k] for k in sorted(prov)}
        with open(os.path.join(REPO, "BENCH_ANCHOR.json"), "w") as fh:
            json.dump(anchor_doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"sf_dir": args.sf_dir, "n": args.n, "results": results}))
    spark.stop()
    return 0 if all(r["verdict"] != "real" for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
