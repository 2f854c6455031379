"""Replay the driver contract end-to-end (the real verification surface).

1. import __spark_entry__ the way the driver does
2. entry(spark) smoke at sf0.001  -> >=1 row, stable schema
3. every queries()[name] at sf0.01 vs oracle_sql()[name] via DuckDB
   (sort cols by name, Decimal->float, sort rows, exact compare)
4. rows-only check for queries with no oracle

Usage: python scripts/verify_contract.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import decimal
import importlib.util
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
            pdf[c] = pdf[c].astype(float)
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-list of query names")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from esvc_spark.session import get_spark

    mod = load_entry()
    spark = get_spark("verify-contract", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. smoke
    rows = mod.entry(spark).collect()
    assert len(rows) >= 1, "entry() returned 0 rows"
    print(f"smoke: entry() -> {len(rows)} rows OK")

    # 2. t2 correctness
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        got = canon(queries[name](spark, args.sf_dir).toPandas())
        dt = time.perf_counter() - t0
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)"
            ok = True
        else:
            want = canon(con.sql(oracles[name]).df())
            ok = list(got.columns) == list(want.columns) and len(got) == len(want)
            if ok:
                for c in got.columns:
                    for i, (x, y) in enumerate(zip(got[c], want[c])):
                        if not eq(x, y):
                            ok = False
                            status = f"MISMATCH {c}[{i}]: spark={x!r} duckdb={y!r}"
                            break
                    if not ok:
                        break
                else:
                    status = f"match ({len(got)} rows)"
            else:
                status = (
                    f"SHAPE spark={len(got)}x{list(got.columns)} "
                    f"duckdb={len(want)}x{list(want.columns)}"
                )
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.1f}s {status}")
        if not ok:
            failed.append(name)

    spark.stop()
    if failed:
        print(f"\nFAILED: {failed}")
        return 1
    print(f"\nall {len([n for n in queries if not only or n in only])} queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
