"""Determinism probe (the CLAUDE.md new-query checklist step): run the
named queries under two deliberately different parallelism configs
(local[4]/shuffle=3 vs local[32]/shuffle=64) and require bit-identical
results. Shuffle-order-dependent float math (raw double sums) diverges
here before it flakes the driver's value-hash gate.

Usage: python scripts/determinism_probe.py q_a,q_b [sf_dir]
"""

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(master: str, shuffle: str, names: list[str], sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import esvc_spark
    from esvc_spark.queries import all_queries

    qs = all_queries()
    out = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
        out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
        esvc_spark.release_cached()
    spark.stop()
    return out


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if os.environ.get("PROBE_CHILD"):
        result = run(
            os.environ["PROBE_MASTER"], os.environ["PROBE_SHUF"], names, sf_dir
        )
        print("RESULT:" + json.dumps(result))
        return 0
    res = []
    for master, shuf in (("local[4]", "3"), ("local[32]", "64")):
        env = dict(
            os.environ, PROBE_CHILD="1", PROBE_MASTER=master, PROBE_SHUF=shuf
        )
        p = subprocess.run(
            [sys.executable, __file__, *sys.argv[1:]],
            env=env,
            capture_output=True,
            text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT:")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-3000:])
            return 1
        res.append(json.loads(line[0][7:]))
    a, b = res
    ok = True
    for name in names:
        same = a[name] == b[name]
        ok = ok and same
        print(f"{'OK ' if same else 'DIVERGENT'} {name}  "
              f"{a[name][:12]} vs {b[name][:12]}")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
