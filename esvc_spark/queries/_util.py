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


# --------------------------------------------------------------- cache scope
# Query functions persist() intermediates that feed multiple plan branches
# (LSH signatures, hashed event sets, shingle tables). The returned
# DataFrame is lazy, so the query itself cannot unpersist — the cache must
# outlive the function until the CALLER materializes. Spark's CacheManager
# holds strong references, so in a long-lived session those entries leak.
# tracked_persist() registers every such intermediate; release_cached()
# (re-exported as esvc_spark.release_cached) drops exactly them — unlike
# spark.catalog.clearCache() it cannot clobber caches the host application
# owns. bench.py and the pytest hygiene test call it after materializing
# each query.

_TRACKED: list = []


def tracked_persist(df):
    """persist() a query intermediate and register it for release_cached()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every intermediate registered by tracked_persist().
    Returns the number released. Safe to call at any time: unpersisting a
    not-yet-materialized frame merely forfeits the cache."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist()
        n += 1
    return n
