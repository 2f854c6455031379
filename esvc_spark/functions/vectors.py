"""Vector math over `array<float>` embedding columns, JVM-side only.

Everything here is built from Spark higher-order functions
(`zip_with` + `aggregate`), so the hot path never leaves Tungsten — no
Python UDF, no serialization. The folds are *sequential in index order*,
which makes the float math bit-deterministic and lets a DuckDB oracle
(same fold order via `list_reduce` over a prepended zero) reproduce the
exact IEEE result: float32 inputs are cast to float64 (exact), then every
multiply/add happens in the same order in both engines.

The `sql_*` helpers emit the DuckDB-dialect twin of each Spark
expression; queries interpolate both from one source of truth so they
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    """array<float> → array<double>; float→double widening is exact."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order ⇒ deterministic).

    Deliberately the higher-order-function fold, NOT an unrolled
    `a[0]*b[0] + …` arithmetic tree: a measured A/B at dim=64 showed the
    unrolled tree 2-8× SLOWER — the giant expression breaks whole-stage
    codegen's method-size limit and falls back to per-node interpreted
    evaluation with boxing, while the fold runs one loop over primitive
    Tungsten arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def py_norm(v) -> float:
    """Driver-side twin of `norm` for values already collected to the
    driver (e.g. a merged centroid built from two collected centroids):
    the SAME left-to-right fold from 0.0 then sqrt, so a norm computed
    here is bit-identical to what the Column expression would produce
    for the same doubles."""
    import math

    acc = 0.0
    for x in v:
        acc += x * x
    return math.sqrt(acc)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with the zero-norm convention cosine(0, ·) = 0.

    A real corpus contains zero embeddings (failed encodes, padding rows);
    under ANSI mode a bare division dies with DIVIDE_BY_ZERO. Convention:
    when either norm is 0 the similarity is defined as 0.0, so zero vectors
    sort last in kNN/similarity rankings instead of crashing the query.
    The DuckDB twin `sql_cosine` carries the identical CASE."""
    denom = norm(a) * norm(b)
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms precomputed per-vector (same expression tree as
    `cosine`, factored: dot/(na*nb)) — bit-identical values, but each pair
    costs one fold instead of three. Use for all-pairs / kNN hot paths.
    Same zero-norm convention as `cosine`: 0.0 when either norm is 0."""
    denom = na * nb
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot(a, b) / denom)


# ---------------------------------------------------------------- DuckDB twins


def sql_dot(a: str, b: str) -> str:
    """DuckDB dot product with the same left-fold order as `dot`."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of `cosine` incl. the zero-norm convention (0.0)."""
    denom = f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)}))"
    return (
        f"(CASE WHEN {denom} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
        f"ELSE {sql_dot(a, b)} / {denom} END)"
    )


def sql_cosine_prenorm(a: str, b: str, na: str, nb: str) -> str:
    """DuckDB twin of `cosine_prenorm` (norms from a CTE column),
    incl. the zero-norm convention (0.0 when either norm is 0)."""
    return (
        f"(CASE WHEN ({na} * {nb}) = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
        f"ELSE {sql_dot(a, b)} / ({na} * {nb}) END)"
    )
