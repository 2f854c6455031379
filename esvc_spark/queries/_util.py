"""Cross-engine numeric determinism helpers.

Double-precision SUM is shuffle-order dependent in Spark and engine-order
dependent in DuckDB, so `sum(double)` cannot hash-match across engines.
Strategy: cast each addend to a fixed-scale DECIMAL (exact integer
arithmetic — order-invariant and identical in both engines; Spark CAST uses
HALF_UP, DuckDB rounds half-away-from-zero: same function on reals), sum
exactly, cast the exact result back to DOUBLE (one correctly-rounded
conversion). AVG = exact decimal sum cast to double, divided by the count:
a single IEEE division, identical in both engines.

The matching DuckDB SQL fragment for `dsum(c, s)` is
    CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)
and for `davg(c, s)`
    CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE) / COUNT(c)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-invariant cross-engine-exact sum of a double column."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Cross-engine-exact average: exact sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
