"""Shared primitives of the documents query family (round-6 split of
the original single module): the md5-derived 60-bit cross-engine hash,
whitespace tokenizer, full-parallelism loader, stopword list, and the
exact fixed-point base-2 log used wherever a score is log-shaped
(BM25/DSIR/entropy/weighted sampling — and by the events family).

Cross-engine determinism: every hash is md5-derived (first 15 hex digits
-> BIGINT, identical in Spark and DuckDB), every similarity is
integer-count arithmetic with one final IEEE division — so oracles match
exactly. All operators are partition-parallel: explode -> hash ->
groupBy/join; no driver-side collection anywhere. At 100 TB the shingle
self-joins are the heavy shuffles; the LSH variants exist exactly to
bound them (band-bucket join instead of all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import sql_dsum, tracked_persist as _tp

# md5-derived 60-bit integer hash (identical in both engines)
_P = 1_000_000_007


def _h(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _sql_h(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _TOKENS() -> Column:
    return F.expr("regexp_extract_all(text, '(\\\\S+)', 1)")


SQL_TOKENS = "regexp_extract_all(text, '(\\S+)', 1)"


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`documents` repartitioned to full parallelism: the sf-scale parquet
    is one split, and the tokenize/shingle/hash work before the first
    shuffle would otherwise run on a single core. At cluster scale the
    scan is multi-split and this extra narrow shuffle of raw docs is noise
    next to the explode that follows."""
    return T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def _bigram_df(
    docs: DataFrame, tokens: Column, *carry: str
) -> DataFrame:
    """Adjacent-token bigrams (carry..., pos, w1, w2) built NARROWLY from
    the token array — one explode, no shuffle, no sort. The previous
    shape (posexplode → lead() over a doc_id window) paid a full sort of
    the exploded token table per query and, on any input not already
    partitioned by doc_id, a corpus-wide exchange (guide §2.4: remove
    shuffles outright). Row multiset and pos values are identical to the
    window version by construction: for each doc, pos = 0..size(w)-2,
    w1 = w[pos], w2 = w[pos+1]; docs with <2 tokens produce no rows
    (sequence() is guarded — Spark's sequence(0, -1) would DESCEND, not
    return empty)."""
    t = F.expr(
        "CASE WHEN size(_w) >= 2 THEN transform(sequence(0, size(_w) - 2),"
        " i -> named_struct('pos', i, 'w1', _w[i], 'w2', _w[i + 1]))"
        " ELSE array() END"
    )
    return (
        docs.withColumn("_w", tokens)
        .select(*carry, F.explode(t).alias("_t"))
        .select(*carry, "_t.pos", "_t.w1", "_t.w2")
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def _qlog2_expr(x: str, dialect: str) -> str:
    """Fixed-point base-2 log of a positive BIGINT expression, ≈
    16·log2(x): integer log from the binary-string length, 4 fractional
    bits by linear interpolation within the octave. One template, two
    dialects (bin vs printf('%%b'), DIV vs //), so the engines cannot
    drift. Exactness: 2^e via pow is exact on powers of two < 2^62; the
    BIGINT cast truncates (Spark) / rounds (DuckDB) an already-exact
    value. Accuracy: underestimates by < 0.086 octave + 1 ulp
    (tests/test_pipeline_ops.py pins both engines and the bound)."""
    if dialect == "spark":
        div = "DIV"
        e = f"(length(bin({x})) - 1)"
    else:
        div = "//"
        e = f"(length(printf('%b', {x})) - 1)"
    p2 = f"CAST(pow(2, {e}) AS BIGINT)"
    return f"((16 * {e}) + ((({x}) * 16) {div} {p2}) - 16)"
