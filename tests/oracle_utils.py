"""Differential-test harness: run a Spark query and its DuckDB oracle on
the same parquet tables and compare row count, column names, and values
(order-insensitive), mirroring the driver's correctness gate.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

from esvc_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if isinstance(v, Decimal) else v
            )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_pdf)
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        return [f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return problems
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float)
            b = b.astype(float)
            for i, (x, y) in enumerate(zip(a, b)):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) != pd.isna(y):
                    problems.append(f"{c}[{i}]: {x!r} vs {y!r} (null mismatch)")
                    break
                if exact:
                    ok = x == y
                else:
                    ok = math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                if not ok:
                    problems.append(f"{c}[{i}]: spark={x!r} oracle={y!r} diff={x - y!r}")
                    break
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(f"{c}[{i}]: spark={a[i]!r} oracle={b[i]!r}")
    return problems
