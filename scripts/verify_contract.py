"""Replay the driver contract end-to-end (the real verification surface).

Round-1 lesson: the repo believed 55/55 while the driver saw 39/56 because
this script used the repo's tuned session factory (extra confs) and a
type-insensitive compare. It now replicates the DRIVER environment:

1. import __spark_entry__ the way the driver does
2. a PLAIN SparkSession — no repo confs (no nanosAsLong, no UTC override,
   default shuffle partitions); anything a query needs must be set by the
   query/loader itself, exactly as under the driver
3. every queries()[name] at sf0.01 vs oracle_sql()[name] via DuckDB,
   compared TYPE-SENSITIVELY: pandas dtype mismatch (e.g. DuckDB HUGEINT
   -> float64 vs Spark int64) is a FAIL even when values are numerically
   equal, because the driver's value-hash canonicalizes types
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


def plain_spark(cpus: int):
    """The driver's environment: a bare SparkSession, no repo confs."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("verify-contract-plain")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


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
    # Type-sensitive: int 3549 vs float 3549.0 is a MISMATCH (the driver's
    # hasher distinguishes them). NaN==NaN holds within float.
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if type(a) is not type(b) and not (
        isinstance(a, str) and isinstance(b, str)
    ):
        # numpy scalars vs python scalars of the same kind are fine;
        # int-vs-float or int-vs-decimal kinds are not.
        import numpy as np

        ka = np.asarray(a).dtype.kind if not isinstance(a, (tuple,)) else "O"
        kb = np.asarray(b).dtype.kind if not isinstance(b, (tuple,)) else "O"
        if ka != kb:
            return False
    return a == b


def dtype_kinds(pdf: pd.DataFrame) -> list[str]:
    return [pdf[c].dtype.kind for c in pdf.columns]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-list of query names")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    mod = load_entry()
    spark = plain_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. smoke
    rows = mod.entry(spark).collect()
    assert len(rows) >= 1, "entry() returned 0 rows"
    print(f"smoke: entry() -> {len(rows)} rows OK")

    # 2. correctness vs DuckDB oracles
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
    # registry order (the driver runs in this order and may truncate)
    def release_between_queries() -> None:
        # The shared between-query hygiene (one implementation across
        # bench/verify/recheck — _util.release_between_queries). This
        # harness keeps full_gc=True: without the collector nudge a
        # FULL-surface run accumulates every query's localCheckpoint
        # blocks in one driver heap — fits at sf0.01, OOMs ~halfway
        # through 224 queries at sf0.1 (the round-7 attestation run
        # found this). Timing harnesses skip the forced gc (pause noise).
        from esvc_spark.queries._util import (
            release_between_queries as _rbq,
        )

        _rbq(spark, full_gc=True)

    for name in queries:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(queries[name](spark, args.sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 - report like the driver does
            print(f"FAIL {name:32s}    ERR {type(e).__name__}: {e}")
            failed.append(name)
            release_between_queries()
            continue
        release_between_queries()
        dt = time.perf_counter() - t0
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)"
            ok = True
        else:
            try:
                want = canon(con.sql(oracles[name]).df())
            except Exception as e:  # noqa: BLE001 - oracle-side failure
                print(f"FAIL {name:32s}    ORACLE ERR {type(e).__name__}: {e}")
                failed.append(name)
                continue
            ok = list(got.columns) == list(want.columns) and len(got) == len(want)
            if ok and dtype_kinds(got) != dtype_kinds(want):
                ok = False
                status = (
                    f"DTYPE spark={list(zip(got.columns, dtype_kinds(got)))} "
                    f"duckdb={list(zip(want.columns, dtype_kinds(want)))}"
                )
            elif ok:
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
