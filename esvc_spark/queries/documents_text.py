"""Text-analysis family over the `documents` table: token stats,
quality scoring (+ AUC/calibration/threshold sweep), language id (+ eval),
normalization, LM scoring, CCNet buckets, BM25/TF-IDF/RRF retrieval,
entropy, Zipf/Heaps laws, repetition, PII redaction, RAG chunking,
BPE merges/encode, bigrams, vocabulary, RAKE, signal correlation.

Split from the original single documents module (round 6) — see
`documents.py` for the registry; shared hashing/tokenising primitives
live in `documents_shared.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import sql_dsum, tracked_persist as _tp
from .documents_shared import _h, _sql_h, _TOKENS, SQL_TOKENS, _bigram_df, _docs_par, _STOPWORDS, _qlog2_expr

# ------------------------------------------------------------- token stats


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    nt = F.size(_TOKENS())
    return (
        docs.withColumn("n_tokens", nt.cast("bigint"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.min("n_tokens").alias("min_tokens"),
        )
    )


_TOKEN_STATS_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
FROM (SELECT lang, CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens FROM documents)
GROUP BY lang
"""

# ------------------------------------------------------------- quality
# Heuristic quality scoring: token count, mean token length, punctuation
# and stopword ratios → one score per doc, aggregated per source. All
# ratios are single divisions of exact integers (cross-engine identical);
# the per-source average goes through the decimal-cast sum.



def _qscored(docs: DataFrame) -> DataFrame:
    """Per-doc heuristic quality score — THE corpus quality metric, and
    the single source for q_doc_quality and its audits (q_doc_signal_corr
    rank agreement, q_doc_jackknife error bars) so the metric can never
    drift from the numbers reported about it. Zero-token docs dropped.
    Columns: doc_id, source, n_chars, n_tokens, n_stop, n_punct, qscore
    (identical expression tree to _QSCORED_SQL)."""
    sw = ",".join(f"'{w}'" for w in _STOPWORDS)
    return (
        docs.withColumn("toks", _TOKENS())
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn(
            "n_stop",
            F.size(F.expr(f"filter(toks, t -> t IN ({sw}))")).cast("bigint"),
        )
        .withColumn(
            "n_punct",
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
            ).cast("bigint"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "qscore",
            (F.col("n_stop").cast("double") / F.col("n_tokens")) * 2.0
            + (1.0 - F.col("n_punct").cast("double") / F.col("n_chars"))
            + F.when(
                (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 1.0
            ).otherwise(0.0),
        )
        .select(
            "doc_id", "source", "n_chars", "n_tokens", "n_stop", "n_punct",
            "qscore",
        )
    )


def _qscored_sql() -> str:
    sw = ",".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
SELECT doc_id, source, n_chars, n_tokens, n_stop, n_punct,
       CAST(n_stop AS DOUBLE) / n_tokens * 2.0
         + (1.0 - CAST(n_punct AS DOUBLE) / n_chars)
         + CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
         AS qscore
FROM (
  SELECT doc_id, source, n_chars,
         CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({SQL_TOKENS}, t -> t IN ({sw})))
              AS BIGINT) AS n_stop,
         CAST(length(text)
              - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM documents
) WHERE n_tokens > 0
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _qscored(_docs_par(spark, sf_dir))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("qscore").cast("decimal(18,6)")).cast("double").alias("sum_quality"),
        F.sum("n_stop").alias("total_stopwords"),
        F.sum("n_punct").alias("total_punct"),
    )


_QUALITY_SQL = f"""
WITH scored AS ({_qscored_sql()})
SELECT source, COUNT(*) AS n_docs,
       {sql_dsum('qscore', 6)} AS sum_quality,
       CAST(SUM(n_stop) AS BIGINT) AS total_stopwords,
       CAST(SUM(n_punct) AS BIGINT) AS total_punct
FROM scored GROUP BY source
"""

# ------------------------------------------------------------- language id
# N-gram/marker-word language heuristic: score each language's marker set
# against the token list; argmax with a deterministic tiebreak. (The
# synthetic corpus shares one vocabulary across langs — the operator still
# exercises the real plumbing: tokenize → score → argmax.)

_LANG_MARKERS = {
    "en": ["the", "a", "is", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
}


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    d = docs.withColumn("toks", _TOKENS())
    for lang, markers in _LANG_MARKERS.items():
        lst = ",".join(f"'{w}'" for w in markers)
        d = d.withColumn(
            f"score_{lang}", F.size(F.expr(f"filter(toks, t -> t IN ({lst}))")).cast("bigint")
        )
    # argmax with tiebreak by language name (greatest-of with stable CASE)
    langs = sorted(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earliest alphabetical wins ties
        pred = F.when((best > 0) & (F.col(f"score_{lg}") == best), lg).otherwise(pred)
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        *[F.col(f"score_{lg}") for lg in langs],
    )


def _langid_sql() -> str:
    score_exprs = []
    for lg in sorted(_LANG_MARKERS):
        lst = ",".join(f"'{w}'" for w in _LANG_MARKERS[lg])
        score_exprs.append(
            f"CAST(len(list_filter({SQL_TOKENS}, t -> t IN ({lst}))) AS BIGINT) AS score_{lg}"
        )
    langs = sorted(_LANG_MARKERS)
    best = f"GREATEST({', '.join('score_' + lg for lg in langs)})"
    pred = "'unknown'"
    for lg in reversed(langs):
        pred = f"CASE WHEN {best} > 0 AND score_{lg} = {best} THEN '{lg}' ELSE {pred} END"
    cols = ", ".join(f"score_{lg}" for lg in langs)
    return f"""
WITH scored AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM documents)
SELECT doc_id, lang, {pred} AS pred_lang, {cols} FROM scored
"""


# ---------------------------------------------------------- normalization
# Text normalization (lowercase, strip punctuation, collapse whitespace)
# with before/after audit: the canonicalization pass that precedes
# hashing/dedup in most pipelines, as pure JVM string functions. The
# checksum over normalized hashes lets downstream jobs assert they read
# the identical normalized corpus; shrinkage quantifies what the pass
# removed.


def q_doc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[.,!?;:]", ""),
            r"\s+",
            " ",
        )
    )
    d = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("len_raw"),
        F.length(norm).cast("bigint").alias("len_norm"),
        _h(norm).alias("h"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len_raw").alias("total_raw"),
        F.sum("len_norm").alias("total_norm"),
        (
            1.0
            - F.sum("len_norm").cast("double") / F.sum("len_raw").cast("double")
        ).alias("shrinkage"),
        F.expr("bit_xor(h)").alias("norm_checksum"),
    )


_NORMALIZE_SQL = f"""
WITH d AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS len_raw,
         CAST(length(n) AS BIGINT) AS len_norm,
         {_sql_h('n')} AS h
  FROM (
    SELECT lang, text,
           trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                               '\\s+', ' ', 'g')) AS n
    FROM documents
  )
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len_raw) AS BIGINT) AS total_raw,
       CAST(SUM(len_norm) AS BIGINT) AS total_norm,
       1.0 - CAST(SUM(len_norm) AS DOUBLE) / CAST(SUM(len_raw) AS DOUBLE)
         AS shrinkage,
       bit_xor(h) AS norm_checksum
FROM d GROUP BY lang
"""


# ------------------------------------------------------- LM scoring
# Bigram language-model scoring with add-1 smoothing: train on the whole
# corpus, score a fixed slice by the MEAN bigram probability — the
# perplexity-style fluency signal of a quality pipeline, kept log-free
# (transcendentals are not correctly-rounded; a mean of rational
# probabilities carries the same ordering signal with exact cross-engine
# arithmetic). Each p is one IEEE division of exact integers; the per-doc
# mean is a sequential fold in token-position order (full-precision
# doubles never round through decimals — see the PageRank note).
# Scale shape: the model tables are vocabulary-bounded; scoring joins the
# scored slice's bigrams against them — the corpus shuffles once to count.

_LM_SCORE_N = 100


def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("w"))
    # persist: the bigram table feeds the two model aggregates AND the
    # scored slice — without it the tokenize pipeline runs 3x.
    # Array-native bigrams (round 11): identical rows to the previous
    # posexplode + lead-window shape, minus the per-query sort of the
    # exploded token table (guide §2.4).
    bi = _bigram_df(docs, _TOKENS(), "doc_id").transform(_tp)
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    scored = (
        bi.filter(F.col("doc_id") < _LM_SCORE_N)
        .join(c12, ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .join(vocab)
        .withColumn(
            "p",
            (F.coalesce("c12", F.lit(0)) + 1).cast("double")
            / (F.coalesce("c1", F.lit(0)) + F.col("v")),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.expr("transform(array_sort(collect_list(struct(pos, p))), t -> t.p)"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("psum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("psum") / F.col("n_bigrams")).alias("lm_score"),
        )
    )


_LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS w
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
bi AS (
  SELECT doc_id, pos, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
scored AS (
  SELECT b.doc_id, b.pos,
         CAST(COALESCE(c12, 0) + 1 AS DOUBLE) / (COALESCE(c1, 0) + v) AS p
  FROM bi b
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  CROSS JOIN vocab
  WHERE b.doc_id < {_LM_SCORE_N}
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
                   (acc, x) -> acc + x) / COUNT(*) AS lm_score
FROM scored GROUP BY doc_id
"""


# ------------------------------------------------- CCNet fluency buckets
# CCNet-style corpus partitioning (Wenzek et al. 2020, arXiv:1911.00359):
# score every document with the corpus-trained bigram LM (same smoothed
# model as q_doc_lm_score, unsliced), then split EACH LANGUAGE into
# equal-count head/middle/tail terciles by fluency — the standard
# quality-tiering step before choosing which tier to train on. Output is
# per (lang, tercile): doc/bigram volume, score range, and a bit_xor
# membership checksum so the oracle attests the exact bucketing.
#
# Determinism: scores are order-pinned folds (bit-identical to DuckDB),
# the tercile rank orders by (lm_score DESC, doc_id) — total order, so
# NTILE agrees across engines. Docs with <2 tokens have no bigrams and
# are absent (no fluency evidence), mirrored by the oracle.
#
# Scale: the model aggregates are map-side-combined counts; the per-lang
# tercile comes from a PARTITION-PARALLEL grouped rank plus exact
# integer NTILE-from-rank arithmetic (round 7 — the q_ev_rfm shape,
# grouped: a partitionBy(lang) NTILE window would put each language's
# whole corpus in one task, and languages are exactly the skewed hot
# keys at 100 TB). Oracle NTILE unchanged.

_CCNET_TILES = 3


def q_doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("w"))
    # persist: bigrams feed the two model aggregates AND the scored pass
    # (same reuse rationale as q_doc_lm_score); array-native bigrams
    # (round 11) — no explode+window sort, identical rows
    bi = _bigram_df(docs, _TOKENS(), "doc_id", "lang").transform(_tp)
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    scored = (
        bi.join(c12, ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .join(vocab)  # single-row vocabulary-size cross join
        .withColumn(
            "p",
            (F.coalesce("c12", F.lit(0)) + 1).cast("double")
            / (F.coalesce("c1", F.lit(0)) + F.col("v")),
        )
    )
    perdoc = (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.expr("transform(array_sort(collect_list(struct(pos, p))), t -> t.p)"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("psum"),
        )
        .select(
            "doc_id", "lang", "n_bigrams",
            (F.col("psum") / F.col("n_bigrams")).alias("lm_score"),
        )
        # perdoc feeds BOTH the rank and the per-lang count branch; on
        # the size-gated LOCAL rank path nothing checkpoints it, so an
        # unpersisted frame would run the whole 18-shuffle tokenize+
        # score pipeline twice (round 8; |documents| rows, cheap to hold)
        .transform(_tp)
    )
    from ..core.spark_engine import grouped_row_number

    from ._util import ntile_from_rank

    # per-lang counts come from the rank frame itself (max rank = group
    # size — checkpoint-pinned on the two-phase path, so this avoids
    # re-evaluating the whole tokenize+score pipeline; the size-gated
    # local path re-derives the deterministic perdoc subtree instead);
    # null-safe join because lang is nullable and the NULL-lang stratum
    # terciles like any other (the previous partitionBy window kept it)
    # n_rows: perdoc is one row per document, so the parquet-metadata
    # documents count bounds it — below TWO_PHASE_MIN_ROWS the helper
    # takes one small window instead of the checkpointed two-phase plan
    from ..catalog import table_rows

    rk = grouped_row_number(
        spark, perdoc, ["lang"], [F.desc("lm_score"), F.asc("doc_id")],
        "_rk", n_rows=table_rows(spark, sf_dir, "documents"),
    )
    nl = rk.groupBy("lang").agg(F.max("_rk").alias("_nl")).withColumnRenamed(
        "lang", "_lang"
    )
    ranked = (
        rk.join(F.broadcast(nl), F.col("lang").eqNullSafe(F.col("_lang")))
        .drop("_lang")
        .withColumn("tercile", ntile_from_rank("_rk", "_nl", _CCNET_TILES))
    )
    return ranked.groupBy("lang", "tercile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
        F.min("lm_score").alias("min_score"),
        F.max("lm_score").alias("max_score"),
        F.expr("bit_xor(doc_id)").alias("member_xor"),
    )


_CCNET_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, CAST(i - 1 AS INT) AS pos, w[i] AS w
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
bi AS (
  SELECT doc_id, lang, pos, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
scored AS (
  SELECT b.doc_id, b.lang, b.pos,
         CAST(COALESCE(c12, 0) + 1 AS DOUBLE) / (COALESCE(c1, 0) + v) AS p
  FROM bi b
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  CROSS JOIN vocab
),
perdoc AS (
  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
                     (acc, x) -> acc + x) / COUNT(*) AS lm_score
  FROM scored GROUP BY doc_id, lang
),
ranked AS (
  SELECT *, CAST(NTILE({_CCNET_TILES}) OVER (
           PARTITION BY lang ORDER BY lm_score DESC, doc_id) AS INTEGER)
         AS tercile
  FROM perdoc
)
SELECT lang, tercile, COUNT(*) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       MIN(lm_score) AS min_score, MAX(lm_score) AS max_score,
       bit_xor(doc_id) AS member_xor
FROM ranked GROUP BY lang, tercile
"""


# ----------------------------------------------------------- BM25
# BM25 retrieval (Robertson & Zaragoza 2009) over the corpus for a fixed
# query set — the lexical-search tier next to the embedding kNN/RAG
# queries. idf uses the classic (N-df+0.5)/(df+0.5) ratio, computed in
# exact fixed-point via _qlog2_expr on the integer-doubled counts
# (2N-2df+1)/(2df+1), so the only engine-sensitive float work is the
# per-term saturation formula — single IEEE ops on identical inputs —
# and the ≤|query|-term score sum, order-pinned by term. Scale: one
# tokenize pass; query terms broadcast; df/dl are corpus aggregates; the
# scored table is |hits| rows, ranked per query.

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
_BM25_QUERIES = (
    (1, "table"), (1, "scan"), (1, "fast"),
    (2, "join"), (2, "merge"), (2, "sort"),
    (3, "customer"), (3, "order"), (3, "value"),
)


def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ._util import ofold_sum

    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("term"))
    # NOT persisted (round 11): the scan census flagged dl/tf double
    # consumption, but interleaved A/B read the persists a wash
    # (med 1.99 → 2.06 s) — the doc_id partitioning from _docs_par means
    # neither aggregate needs an exchange, so the re-scans are cheap
    # pipelined map work and the cache write only buys memory pressure.
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    nd_avg = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("dl").cast("bigint").alias("tot"),
    )
    qterms = spark.createDataFrame(list(_BM25_QUERIES), "qid INT, term STRING")
    tf = (
        toks.join(F.broadcast(qterms), "term")
        .groupBy("qid", "term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = (
        tf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    idf_expr = (
        f"({_qlog2_expr('(2 * nd - 2 * df + 1)', 'spark')}"
        f" - {_qlog2_expr('(2 * df + 1)', 'spark')})"
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(nd_avg))  # single-row corpus-stats cross join
        .withColumn("idf_q", F.expr(idf_expr).cast("bigint"))
        .withColumn("avgdl", F.col("tot").cast("double") / F.col("nd"))
        .withColumn(
            "contrib",
            (F.col("idf_q").cast("double") / F.lit(16.0))
            * (F.col("tf").cast("double") * F.lit(_BM25_K1 + 1))
            / (
                F.col("tf").cast("double")
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0 - _BM25_B)
                    + F.lit(_BM25_B)
                    * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            ),
        )
    )
    per = scored.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        ofold_sum("term", "contrib").alias("score"),
    )
    # two-phase per-query top-k (operators/topk.py): the hit set is
    # corpus-proportional for common terms
    from ..operators.topk import topk_per_group

    return (
        topk_per_group(
            per, ["qid"], [F.col("score").desc(), F.col("doc_id")],
            _BM25_TOPK,
        )
        .withColumn("rank", F.col("rank").cast("bigint"))
        .select("qid", "doc_id", "n_hit_terms", "score", "rank")
    )


def _bm25_sql() -> str:
    from ._util import sql_ofold_sum

    vals = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)
    idf = (
        f"({_qlog2_expr('(2 * nd - 2 * df + 1)', 'duckdb')}"
        f" - {_qlog2_expr('(2 * df + 1)', 'duckdb')})"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
nd_avg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl) AS BIGINT) AS tot FROM dl
),
qterms AS (SELECT * FROM (VALUES {vals}) v(qid, term)),
tf AS (
  SELECT qid, term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks JOIN qterms USING (term)
  GROUP BY qid, term, doc_id
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT term, doc_id FROM tf) GROUP BY term
),
scored AS (
  SELECT qid, doc_id, term,
         (CAST({idf} AS DOUBLE) / 16.0)
           * (CAST(tf AS DOUBLE) * {_BM25_K1 + 1})
           / (CAST(tf AS DOUBLE)
              + {_BM25_K1} * ({1.0 - _BM25_B}
                 + {_BM25_B} * (CAST(dl AS DOUBLE)
                                / (CAST(tot AS DOUBLE) / nd))))
           AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN nd_avg
),
per AS (
  SELECT qid, doc_id, COUNT(*) AS n_hit_terms,
         {sql_ofold_sum('term', 'contrib')} AS score
  FROM scored GROUP BY qid, doc_id
)
SELECT qid, doc_id, n_hit_terms, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM per QUALIFY rank <= {_BM25_TOPK}
"""


# ----------------------------------------------------------- entropy
# Token-entropy quality filter: per-document Shannon entropy of the
# token distribution in bits/token — the compression-proxy signal that
# catches machine-generated boilerplate (near-zero entropy) and random
# gibberish (entropy ≈ log2 vocab) that length/stopword heuristics miss.
# Computed EXACTLY in fixed-point via the identity
#   Σ_t c_t·(log2 n − log2 c_t) = n·log2 n − Σ_t c_t·log2 c_t
# with _qlog2_expr (16× fixed-point, integer-only): per-doc state is two
# BIGINT aggregates over the token histogram — one shuffle, map-side
# combined — and the only float op is the final bits-per-token division.
# Zero-token docs have no histogram rows and are absent (like the other
# token queries).

_ENTROPY_LOW = 4.5  # bits/token; below ≈ repetitive/boilerplate here


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", "source", F.explode(_TOKENS()).alias("tok")
    )
    hist = toks.groupBy("doc_id", "lang", "source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    per = hist.groupBy("doc_id", "lang", "source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.sum(F.col("c") * F.expr(_qlog2_expr("c", "spark")))
        .cast("bigint")
        .alias("s1"),
    )
    e = per.withColumn(
        "ent_q",
        F.col("n_tokens") * F.expr(_qlog2_expr("n_tokens", "spark"))
        - F.col("s1"),
    ).withColumn(
        "bits_per_token",
        F.col("ent_q").cast("double") / (F.col("n_tokens") * 16),
    )
    return e.select(
        "doc_id", "lang", "source", "n_tokens", "distinct_tokens", "ent_q",
        "bits_per_token",
        (F.col("bits_per_token") < F.lit(_ENTROPY_LOW)).alias("is_low"),
    )


def _entropy_sql() -> str:
    qc = _qlog2_expr("c", "duckdb")
    qn = _qlog2_expr("n_tokens", "duckdb")
    return f"""
WITH hist AS (
  SELECT doc_id, lang, source, tok, COUNT(*) AS c
  FROM (SELECT doc_id, lang, source, unnest({SQL_TOKENS}) AS tok
        FROM documents)
  GROUP BY doc_id, lang, source, tok
),
per AS (
  SELECT doc_id, lang, source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS distinct_tokens,
         CAST(SUM(c * {qc}) AS BIGINT) AS s1
  FROM hist GROUP BY doc_id, lang, source
),
e AS (
  SELECT doc_id, lang, source, n_tokens, distinct_tokens,
         n_tokens * {qn} - s1 AS ent_q
  FROM per
)
SELECT doc_id, lang, source, n_tokens, distinct_tokens,
       CAST(ent_q AS BIGINT) AS ent_q,
       CAST(ent_q AS DOUBLE) / (n_tokens * 16) AS bits_per_token,
       CAST(ent_q AS DOUBLE) / (n_tokens * 16) < {_ENTROPY_LOW} AS is_low
FROM e
"""


# ------------------------------------------------------- BPE-ish tokens
# Subword-style token counting with a GPT-2-like pre-tokenizer regex
# (contraction suffixes | space+letters | space+digits | space+punct runs
# | whitespace runs) next to plain whitespace tokens — the cheap
# token-budget estimator of a training-data pipeline. The pattern uses
# only RE2/Java-common syntax (no lookarounds) so both engines agree.

_BPE_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+"
)


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    pat = _BPE_RE.replace("\\", "\\\\").replace("'", "\\'")
    d = docs.select(
        "lang",
        F.size(_TOKENS()).cast("bigint").alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{pat}', 0))")
        .cast("bigint")
        .alias("bpe_tokens"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        (F.sum("bpe_tokens").cast("double") / F.sum("ws_tokens")).alias(
            "bpe_per_ws"
        ),
    )


def _bpe_sql() -> str:
    pat = _BPE_RE.replace("'", "''")
    return f"""
WITH d AS (
  SELECT lang,
         CAST(len({SQL_TOKENS}) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS bpe_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(bpe_tokens) AS DOUBLE) / SUM(ws_tokens) AS bpe_per_ws
FROM d GROUP BY lang
"""




# ------------------------------------------------------- tf-idf terms
# Top-3 characteristic terms per document by tf·idf with a rational idf
# (N/df — no transcendental log, so both engines produce the identical
# IEEE double). df is corpus-global; the per-doc output is bounded to
# doc_id < 100 so result size is sf-independent. At scale: one explode +
# two aggregates; df has token-vocabulary cardinality (tiny vs corpus),
# broadcast back for the score join.

_TFIDF_DOCS = 100
_TFIDF_K = 3


def q_doc_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("term"))
    n_docs = docs.count()
    dfreq = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    tf = (
        toks.filter(F.col("doc_id") < _TFIDF_DOCS)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "score",
        F.col("tf").cast("double")
        * (F.lit(float(n_docs)) / F.col("df").cast("double")),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


_TFIDF_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY term),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE doc_id < {_TFIDF_DOCS} GROUP BY doc_id, term),
scored AS (
  SELECT doc_id, tf.term, tf, df,
         CAST(tf AS DOUBLE) * (n.n_docs / CAST(df AS DOUBLE)) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= {_TFIDF_K}
"""



# ------------------------------------------------------------- bigrams
# Top-5 token bigrams per language — collocation stats (the n-gram LM
# building block). One explode + posexplode pairing via index zip, one
# aggregate, one windowed top-k; ties broken lexicographically so ranks
# are deterministic.

_BIGRAM_K = 5


def q_doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    toks = docs.select("lang", _TOKENS().alias("w"))
    bi = toks.select(
        "lang",
        F.explode(
            # greatest(...,0): a zero-token document would make the slice
            # length -1, a runtime error (same guard as q_doc_repetition)
            F.expr(
                "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
                " (x, i) -> concat(x, ' ', w[i + 1]))"
            )
        ).alias("bigram"),
    )
    counts = bi.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _BIGRAM_K)
        .select("lang", "bigram", "n", "rk")
    )


_BIGRAMS_SQL = f"""
WITH toks AS (SELECT lang, {SQL_TOKENS} AS w FROM documents),
bi AS (
  SELECT lang, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, unnest(range(1, len(w))) t(i)
  WHERE len(w) >= 2
),
counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY lang, bigram)
SELECT lang, bigram, n,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY n DESC, bigram ASC) AS BIGINT) AS rk
FROM counts QUALIFY rk <= {_BIGRAM_K}
"""


# ------------------------------------------------------------ vocabulary
# Corpus vocabulary profile per language: distinct-token (type) counts vs
# total occurrences — the type/token ratio a corpus audit reports. One
# explode + one aggregate; the distinct count shuffles only (lang, token)
# pairs, which is vocabulary-bounded, not corpus-bounded.


def q_doc_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    tok = docs.select("lang", "doc_id", F.explode(_TOKENS()).alias("token"))
    return tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
        (F.countDistinct("token").cast("double") / F.count(F.lit(1))).alias("ttr"),
    )


_VOCAB_SQL = f"""
SELECT lang, COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS total_tokens,
       COUNT(DISTINCT token) AS vocab_size,
       CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS ttr
FROM (SELECT lang, doc_id, unnest({SQL_TOKENS}) AS token FROM documents)
GROUP BY lang
"""


# ------------------------------------------------------------- repetition
# Gopher-style repetition filters (Rae et al. 2021 §A1.1 as public
# prior art): fraction of duplicated tokens and the most-frequent-bigram
# share, per document, with an integer-arithmetic keep decision. The
# Spark plan is fully narrow — the per-doc top-bigram count is a pinned
# fold over the SORTED bigram array (max run length == max group count),
# so at 100 TB this is scan → project with NO shuffle at all; the oracle
# states the same values relationally (group-by) because DuckDB's
# list_reduce can't carry a struct accumulator.

_REP_TOP = (
    "aggregate(array_sort(bi), "
    "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
    "(acc, x) -> named_struct("
    "  'prev', x, "
    "  'run', IF(x <=> acc.prev, acc.run + 1L, 1L), "
    "  'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))), "
    "acc -> acc.best)"
)


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    d = (
        docs.withColumn("toks", _TOKENS())
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn(
            "n_distinct", F.size(F.array_distinct("toks")).cast("bigint")
        )
        .withColumn(
            "bi",
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (x, i) -> concat(x, ' ', toks[i + 1]))"
            ),
        )
        .withColumn("n_bigrams", F.greatest(F.size("toks") - 1, F.lit(0)).cast("bigint"))
        .withColumn("top_bigram_n", F.expr(_REP_TOP).cast("bigint"))
    )
    # keep: duplicated-token fraction <= 0.8 AND top-bigram share <= 0.05,
    # decided in exact integer cross-multiplication (no float compare)
    keep = (
        (F.lit(5) * (F.col("n_tokens") - F.col("n_distinct")) <= F.lit(4) * F.col("n_tokens"))
        & (F.lit(20) * F.col("top_bigram_n") <= F.col("n_bigrams"))
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_bigram_n",
        "n_bigrams",
        F.when(
            F.col("n_tokens") > 0,
            (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("top_bigram_n").cast("double") / F.col("n_bigrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        keep.cast("int").alias("keep"),
    )


_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
base AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         CAST(GREATEST(len(w) - 1, 0) AS BIGINT) AS n_bigrams
  FROM toks
),
bi AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, unnest(range(1, len(w))) t(i)
  WHERE len(w) >= 2
),
bc AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bi GROUP BY 1, 2),
top AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS top_bigram_n FROM bc GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       CAST(COALESCE(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n, b.n_bigrams,
       CASE WHEN b.n_tokens > 0
            THEN CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN b.n_bigrams > 0
            THEN CAST(COALESCE(t.top_bigram_n, 0) AS DOUBLE) / b.n_bigrams
            ELSE 0.0 END AS top_bigram_frac,
       CAST(5 * (b.n_tokens - b.n_distinct) <= 4 * b.n_tokens
            AND 20 * COALESCE(t.top_bigram_n, 0) <= b.n_bigrams AS INTEGER) AS keep
FROM base b LEFT JOIN top t USING (doc_id)
"""

# ------------------------------------------------------------- PII redaction
# PII detection + redaction (emails, IPv4, phone numbers) — the privacy
# scrub every training pipeline runs. The synthetic corpus contains no
# PII, so the query plants a deterministic doc_id-derived contact footer
# on each document first; both engines build the identical string, so
# the oracle genuinely exercises the detection/redaction regexes (a
# no-op corpus would vacuously hash-match even with broken patterns).
# Narrow plan: scan → project, no shuffle; at 100 TB this is the shape
# you want (regex work scales with bytes, embarrassingly parallel).

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    footer = F.concat(
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example."),
        F.when(F.col("doc_id") % 2 == 0, F.lit("com")).otherwise(F.lit("org")),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("bigint"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("bigint"),
        F.lit(".1 call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") * 13) % 10000).cast("string"), 4, "0"),
    )
    d = docs.withColumn("full_text", F.concat(F.col("text"), footer))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("full_text", _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IP,
        "[IP]",
    )
    return d.select(
        "doc_id",
        F.regexp_count("full_text", F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count("full_text", F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
        F.regexp_count("full_text", F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
    )


_PII_SQL = rf"""
WITH with_footer AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.'
              || CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END
              || ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
              || '.1 call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
           AS full_text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(full_text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(full_text, '{_PII_IP}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(full_text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(full_text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g'),
             '{_PII_IP}', '[IP]', 'g')) AS redacted_md5
FROM with_footer
"""


# ------------------------------------------------------------- RAG chunking
# Sliding-window document chunking (64-token windows, stride 48 → 16
# tokens of overlap) — the retrieval-corpus preparation stage of a RAG
# pipeline. One explode per doc, narrow otherwise; at 100 TB the chunk
# blowup (~n_tokens/48 rows per doc) stays partition-local until a
# downstream op shuffles it.

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    d = (
        docs.withColumn("toks", _TOKENS())
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "chunk_idx",
            F.explode(
                F.expr(
                    f"sequence(0, cast((n_tokens + {_CHUNK_STRIDE - 1}) div {_CHUNK_STRIDE} as int) - 1)"
                )
            ),
        )
        .withColumn(
            "chunk_toks",
            F.expr(f"slice(toks, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})"),
        )
    )
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk_toks").cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join("chunk_toks", " ")).alias("chunk_md5"),
    )


_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKENS} AS w, CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         list_slice(w, i * {_CHUNK_STRIDE} + 1,
                    LEAST(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n_tokens)) AS cw
  FROM toks, unnest(range(0, (n_tokens + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE})) t(i)
  WHERE n_tokens > 0
)
SELECT doc_id, chunk_idx, CAST(len(cw) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(cw, ' ')) AS chunk_md5
FROM chunks
"""

# ------------------------------------------------------------- BPE merges
# Distributed BPE merge induction (Sennrich et al. 2016 as public prior
# art): two unrolled merge rounds of the tokenizer-training loop. Words
# are encoded as marker-wrapped symbol strings ('>a<>b<>c<'), so a merge
# is a plain string replace of '>a<>b<' with '>ab<' — left-to-right
# non-overlapping in both engines, which IS greedy BPE order — and a
# symbol can never false-match a suffix/prefix of another (the '>'/'<'
# markers anchor whole symbols). Fully declarative: each round's top
# pair is a 1-row DataFrame cross-joined (broadcast) into the corpus;
# no driver-side collect. At 100 TB each round is one pair-count
# shuffle + one broadcast — the same shape per extra merge.


def q_doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    words = docs.select(F.explode(_TOKENS()).alias("word"))
    enc0 = F.concat(F.lit(">"), F.array_join(F.split("word", ""), "<>"), F.lit("<"))
    w = words.select(enc0.alias("enc")).transform(_tp)

    # wrapped symbols of each word: ['>a<', '>b<', ...]; a pair pattern is
    # just wrapped[i] || wrapped[i+1]
    syms = F.expr("regexp_extract_all(enc, '(>[^<]*<)', 1)")

    def top_pair(wdf: DataFrame, rank: int) -> DataFrame:
        pairs = wdf.withColumn("syms", syms).select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> concat(x, syms[i + 1]))"
                )
            ).alias("pair")
        )
        return (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .select(F.lit(rank).alias("merge_rank"), "pair", "pair_count")
        )

    rounds = []
    for rank in (1, 2):
        # persist: each round's 1-row top pair feeds BOTH the corpus
        # rewrite and the final union — unpersisted, round 1's full
        # pair-count pass re-ran inside round 2's lineage (round 11)
        t = top_pair(w, rank).transform(_tp)
        rounds.append(t)
        # apply the merge: '>a<>b<' -> '>ab<' (drop the inner markers)
        w = w.crossJoin(F.broadcast(t.select(F.col("pair").alias("p")))).select(
            F.replace(
                F.col("enc"), F.col("p"), F.replace(F.col("p"), F.lit("<>"), F.lit(""))
            ).alias("enc")
        )

    out = rounds[0].unionByName(rounds[1])
    return out.select(
        "merge_rank",
        F.regexp_replace("pair", "[<>]", "").alias("merged"),
        "pair_count",
    )


def q_doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the two learned BPE merges to encode the corpus and report
    the compression they buy — closing the tokenizer-training loop
    (learn merges → encode → measure). Symbol counts are marker counts
    on the encoded string (pure integer string math); one row per lang
    so the oracle pins per-domain compression."""
    docs = _docs_par(spark, sf_dir)
    words = docs.select("lang", F.explode(_TOKENS()).alias("word"))
    enc0 = F.concat(F.lit(">"), F.array_join(F.split("word", ""), "<>"), F.lit("<"))
    w = words.select("lang", enc0.alias("enc")).transform(_tp)

    syms = F.expr("regexp_extract_all(enc, '(>[^<]*<)', 1)")
    cur = w
    for _ in (1, 2):
        pairs = cur.withColumn("syms", syms).select(
            "lang",
            "enc",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> concat(x, syms[i + 1]))"
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .select(F.col("pair").alias("p"))
            # persist: round 1's top pair re-enters round 2's lineage
            # (same rationale as q_doc_bpe_merges — round 11)
            .transform(_tp)
        )
        cur = cur.crossJoin(F.broadcast(top)).select(
            "lang",
            F.replace(
                F.col("enc"), F.col("p"), F.replace(F.col("p"), F.lit("<>"), F.lit(""))
            ).alias("enc"),
        )
    # symbol count = number of '<' markers; char count = marker-free length
    n_syms = F.length("enc") - F.length(F.replace(F.col("enc"), F.lit("<"), F.lit("")))
    chars = F.length(F.regexp_replace("enc", "[<>]", "")).cast("bigint")
    return (
        cur.select(
            "lang", n_syms.cast("bigint").alias("n_syms"), chars.alias("n_chars")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").alias("chars_total"),
            F.sum("n_syms").alias("symbols_after"),
            (
                F.sum("n_chars").cast("double") / F.sum("n_syms").cast("double")
            ).alias("chars_per_symbol"),
        )
    )


def _bpe_encode_sql() -> str:
    return f"""
WITH words AS (SELECT lang, unnest({SQL_TOKENS}) AS word FROM documents),
enc1 AS (
  SELECT lang, '>' || array_to_string(string_split(word, ''), '<>') || '<' AS enc
  FROM words
),
s1 AS (SELECT regexp_extract_all(enc, '(>[^<]*<)', 1) AS s FROM enc1),
p1 AS (
  SELECT s[i] || s[i + 1] AS pair FROM s1, unnest(range(1, len(s))) t(i)
  GROUP BY 1 ORDER BY COUNT(*) DESC, pair ASC LIMIT 1
),
enc2 AS (
  SELECT lang, replace(enc, (SELECT pair FROM p1),
                       replace((SELECT pair FROM p1), '<>', '')) AS enc
  FROM enc1
),
s2 AS (SELECT regexp_extract_all(enc, '(>[^<]*<)', 1) AS s FROM enc2),
p2 AS (
  SELECT s[i] || s[i + 1] AS pair FROM s2, unnest(range(1, len(s))) t(i)
  GROUP BY 1 ORDER BY COUNT(*) DESC, pair ASC LIMIT 1
),
enc3 AS (
  SELECT lang, replace(enc, (SELECT pair FROM p2),
                       replace((SELECT pair FROM p2), '<>', '')) AS enc
  FROM enc2
),
m AS (
  SELECT lang,
         CAST(length(enc) - length(replace(enc, '<', '')) AS BIGINT) AS n_syms,
         CAST(length(regexp_replace(enc, '[<>]', '', 'g')) AS BIGINT) AS n_chars
  FROM enc3
)
SELECT lang, COUNT(*) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(n_syms) AS BIGINT) AS symbols_after,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_syms) AS DOUBLE)
         AS chars_per_symbol
FROM m GROUP BY lang
"""


_BPE_MERGES_SQL = f"""
WITH words AS (SELECT unnest({SQL_TOKENS}) AS word FROM documents),
enc1 AS (
  SELECT '>' || array_to_string(string_split(word, ''), '<>') || '<' AS enc
  FROM words
),
s1 AS (SELECT regexp_extract_all(enc, '(>[^<]*<)', 1) AS s FROM enc1),
p1 AS (
  SELECT s[i] || s[i + 1] AS pair, COUNT(*) AS pair_count
  FROM s1, unnest(range(1, len(s))) t(i)
  GROUP BY 1 ORDER BY pair_count DESC, pair ASC LIMIT 1
),
enc2 AS (
  SELECT replace(enc, (SELECT pair FROM p1),
                 replace((SELECT pair FROM p1), '<>', '')) AS enc
  FROM enc1
),
s2 AS (SELECT regexp_extract_all(enc, '(>[^<]*<)', 1) AS s FROM enc2),
p2 AS (
  SELECT s[i] || s[i + 1] AS pair, COUNT(*) AS pair_count
  FROM s2, unnest(range(1, len(s))) t(i)
  GROUP BY 1 ORDER BY pair_count DESC, pair ASC LIMIT 1
)
SELECT 1 AS merge_rank, regexp_replace(pair, '[<>]', '', 'g') AS merged, pair_count
FROM p1
UNION ALL
SELECT 2, regexp_replace(pair, '[<>]', '', 'g'), pair_count FROM p2
"""


# -------------------------------------------------- signal correlation
# Quality-signal agreement audit: Spearman rank correlation between the
# heuristic quality score (stopword/punct/length) and the corpus-trained
# bigram-LM fluency score, over the LM-scored slice — the check a
# curation pipeline runs before swapping one cheap filter for another
# ("do these two signals even order documents the same way?"). Ranks
# are ROW_NUMBERs over a pinned (score, doc_id) order, so ties resolve
# identically in both engines and everything after the two scores is
# integer: ρ = 1 − 6·Σd²/(n·(n²−1)) with one final double division.
# Both scores are fixed single-IEEE-op expression trees over exact
# integers/folds, hence bit-identical cross-engine.
#
# Scale: the LM model tables are the q_doc_lm_score shapes (vocabulary-
# bounded); the ranked slice is _LM_SCORE_N rows; output is one row.


def q_doc_signal_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    qual = _qscored(_docs_par(spark, sf_dir)).select("doc_id", "qscore")
    lm = q_doc_lm_score(spark, sf_dir).select("doc_id", "lm_score")
    j = lm.join(qual, "doc_id")
    wa = Window.orderBy("qscore", "doc_id")
    wb = Window.orderBy("lm_score", "doc_id")
    ranked = j.select(
        "doc_id",
        F.row_number().over(wa).cast("bigint").alias("ra"),
        F.row_number().over(wb).cast("bigint").alias("rb"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("bigint")
        .alias("sum_d2"),
    ).select(
        "n_docs",
        "sum_d2",
        (
            F.lit(1.0)
            - F.expr(
                "CAST(6 * sum_d2 AS DOUBLE)"
                " / (n_docs * (n_docs * n_docs - 1))"
            )
        ).alias("spearman"),
    )


def _signal_corr_sql() -> str:
    return f"""
WITH qual AS (SELECT doc_id, qscore FROM ({_qscored_sql()}) s),
lm AS (SELECT doc_id, lm_score FROM ({_LM_SCORE_SQL}) q),
j AS (SELECT l.doc_id, qscore, lm_score FROM lm l JOIN qual USING (doc_id)),
ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY qscore, doc_id) AS BIGINT) AS ra,
         CAST(ROW_NUMBER() OVER (ORDER BY lm_score, doc_id) AS BIGINT) AS rb
  FROM j
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
       1.0 - CAST(6 * SUM((ra - rb) * (ra - rb)) AS DOUBLE)
             / (COUNT(*) * (COUNT(*) * COUNT(*) - 1)) AS spearman
FROM ranked
"""


# ------------------------------------------------------------------- Zipf
# Zipf-law slope audit per language: fit log2(freq) ~ a + s·log2(rank) by
# least squares over the full rank-frequency table. Natural language sits
# near s ≈ −1; |s| far from 1 flags template/boilerplate corpora (too
# steep = few tokens dominate) or synthetic/gibberish text (too flat) —
# a corpus-level health check next to the per-doc entropy filter.
#
# Cross-engine exactness: both axes go through _qlog2_expr (16× fixed-
# point integer log2 — identical in both engines); rank is a pinned
# ROW_NUMBER (freq DESC, token); the normal-equation terms
#   num = n·Σxy − Σx·Σy,  den = n·Σx² − (Σx)²
# are BIGINT all the way (per-term xy ≤ (16·63)² ≈ 1e6, so n·Σxy is safe
# through ~10^12 vocabulary terms; widen to DECIMAL(38,0) beyond), and
# the slope is ONE final double division. Scale shape: one token-count
# shuffle (map-side combined) + one per-lang rank window over the
# vocabulary-sized table — raw text is scanned once.


def q_doc_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    freq = (
        docs.select("lang", F.explode(_TOKENS()).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("tok"))
    xy = (
        freq.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn("x", F.expr(_qlog2_expr("rank", "spark")).cast("bigint"))
        .withColumn("y", F.expr(_qlog2_expr("c", "spark")).cast("bigint"))
    )
    per = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    res = per.select(
        "lang",
        "n_terms",
        "total_tokens",
        (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "num"
        ),
        (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "den"
        ),
    )
    return res.select(
        "lang",
        "n_terms",
        "total_tokens",
        "num",
        "den",
        F.when(
            F.col("den") != 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("zipf_slope"),
    )


def _zipf_sql() -> str:
    qr = _qlog2_expr("rank", "duckdb")
    qc = _qlog2_expr("c", "duckdb")
    return f"""
WITH freq AS (
  SELECT lang, tok, COUNT(*) AS c
  FROM (SELECT lang, unnest({SQL_TOKENS}) AS tok FROM documents)
  GROUP BY lang, tok
),
ranked AS (
  SELECT lang, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY c DESC, tok) AS BIGINT) AS rank
  FROM freq
),
xy AS (
  SELECT lang, c, CAST({qr} AS BIGINT) AS x, CAST({qc} AS BIGINT) AS y
  FROM ranked
),
per AS (
  SELECT lang, COUNT(*) AS n_terms, CAST(SUM(c) AS BIGINT) AS total_tokens,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY lang
)
SELECT lang, n_terms, total_tokens,
       n_terms * sxy - sx * sy AS num,
       n_terms * sxx - sx * sx AS den,
       CASE WHEN n_terms * sxx - sx * sx <> 0
            THEN CAST(n_terms * sxy - sx * sy AS DOUBLE)
                 / CAST(n_terms * sxx - sx * sx AS DOUBLE)
       END AS zipf_slope
FROM per
"""


# -------------------------------------------------------------- RAKE
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal stopword-free token runs (capped at _RAKE_MAX_LEN
# words, the classic heuristic), each word w gets freq(w) = occurrences
# and deg(w) = Σ length of phrases containing it, and a phrase scores
# Σ_w deg(w)/freq(w). Per-word ratios are exact fixed point
# (deg·2^20 DIV freq) so the integer phrase scores are engine-identical;
# output is the deterministic top-_RAKE_TOP phrases by
# (score, occurrences, phrase).
#
# Scale shape: phrase segmentation is a per-document window (one
# shuffle keyed by doc); word stats are a vocabulary-sized aggregate
# broadcast back onto the phrase-word rows; the top-k is
# orderBy().limit() (TakeOrderedAndProject — per-partition heaps, then
# a k-row merge), so the |distinct phrases| table never funnels
# through a single ranking task. No joins over corpus-sized sides
# except the broadcast vocabulary.

_RAKE_STOP = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "in", "is", "it", "not", "of", "on", "or", "that", "the",
    "this", "to", "was", "with",
)
_RAKE_MAX_LEN = 4
_RAKE_TOP = 50


def q_doc_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    stop_arr = ", ".join(f"'{s}'" for s in _RAKE_STOP)
    toks = docs.select(
        "doc_id", F.posexplode(_TOKENS()).alias("pos", "tok")
    ).withColumn("is_stop", F.expr(f"tok IN ({stop_arr})").cast("int"))
    wp = Window.partitionBy("doc_id").orderBy("pos")
    words = (
        toks.withColumn(
            "phrase_id",
            F.sum("is_stop").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("is_stop") == 0)
        .withColumn(
            "plen",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id", "phrase_id")),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
        .transform(_tp)  # feeds the vocabulary aggregate and the re-join
    )
    wscore = words.groupBy("tok").agg(
        F.expr("(sum(plen) * 1048576) div count(1)").alias("wscore_q")
    )
    phrases = (
        words.join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, tok))), t -> t.tok), ' ')"
            ).alias("phrase"),
            F.max("plen").alias("n_words"),
            F.sum("wscore_q").cast("bigint").alias("score_q"),
        )
    )
    top = phrases.groupBy("phrase").agg(
        F.max("n_words").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("score_q").alias("score_q"),
    )
    # Top-k via orderBy().limit() (TakeOrderedAndProject: per-partition
    # top-k then a k-row merge — partition-parallel), NOT a global
    # row_number window that would funnel the |distinct phrases| table
    # through one task. The (score, occurrences, phrase) key is a total
    # order, so the k-row set is deterministic.
    return (
        top.orderBy(
            F.desc("score_q"), F.desc("n_occurrences"), F.col("phrase")
        )
        .limit(_RAKE_TOP)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            "score_q",
            (F.col("score_q").cast("double") / F.lit(1048576.0))
            .alias("rake_score"),
        )
    )


_RAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, w[i] AS tok, i AS pos,
         CASE WHEN w[i] IN ({", ".join(f"'{s}'" for s in _RAKE_STOP)})
              THEN 1 ELSE 0 END AS is_stop
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
words AS (
  SELECT * FROM (
    SELECT doc_id, tok, pos, is_stop,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS phrase_id
    FROM toks
  ) s
  WHERE is_stop = 0
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, tok, pos, phrase_id,
           COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS plen
    FROM words
  ) s
  WHERE plen <= {_RAKE_MAX_LEN}
),
wscore AS (
  SELECT tok, (CAST(SUM(plen) AS BIGINT) * 1048576) // COUNT(*) AS wscore_q
  FROM capped GROUP BY tok
),
phrases AS (
  SELECT c.doc_id, c.phrase_id,
         string_agg(c.tok, ' ' ORDER BY c.pos) AS phrase,
         CAST(MAX(c.plen) AS BIGINT) AS n_words,
         CAST(SUM(w.wscore_q) AS BIGINT) AS score_q
  FROM capped c JOIN wscore w USING (tok)
  GROUP BY c.doc_id, c.phrase_id
),
top AS (
  SELECT phrase, MAX(n_words) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(score_q) AS score_q
  FROM phrases GROUP BY phrase
)
SELECT phrase, n_words, n_occurrences, score_q,
       CAST(score_q AS DOUBLE) / 1048576.0 AS rake_score
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_q DESC, n_occurrences DESC,
                               phrase) AS rnk
  FROM top
) r
WHERE rnk <= {_RAKE_TOP}
"""


# ---------------------------------------------------------- RRF fusion
# Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009): for
# each query document, a LEXICAL ranking (distinct-token Jaccard in
# fixed point, ties → doc_id) and a SEMANTIC ranking (embedding cosine,
# vec_id = doc_id, the q_emb_knn_cosine convention) are fused as
#   rrf_q = Σ_r 2^20 DIV (60 + rank_r)   over the rankings where the
# doc appears in the top _RRF_POOL — the standard "BM25 + dense" hybrid
# every production retrieval stack runs, scored in exact integers.
#
# Scale shape: the query side (_RRF_NQ docs) broadcasts into both
# rankings (knn shape, annotated); the lexical intersection is an
# equality join on token against the broadcast query tokens; the fusion
# is a full-outer join of two bounded top-_RRF_POOL lists per query.

_RRF_NQ = 10
_RRF_POOL = 20
_RRF_TOP = 10
_RRF_C = 60


def q_doc_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine_prenorm
    from .embeddings import _emb_normed

    docs = _docs_par(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(_TOKENS()).alias("tok")
    ).distinct().transform(_tp)
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    qtoks = toks.filter(F.col("doc_id") < _RRF_NQ).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    qsizes = sizes.filter(F.col("doc_id") < _RRF_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("sz").alias("qsz")
    )
    inter = (
        toks.join(F.broadcast(qtoks), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    # two-phase per-query top-k on both retrieval arms
    # (operators/topk.py): the lexical hit set and the semantic scored
    # set are corpus-proportional; only the fused <=2*pool window stays
    # a plain per-query window (bounded by construction)
    from ..operators.topk import topk_per_group

    lex = (
        topk_per_group(
            inter.join(sizes, "doc_id")
            .join(F.broadcast(qsizes), "query_id")
            .select(
                "query_id",
                "doc_id",
                F.expr("(inter * 1048576) div (qsz + sz - inter)")
                .alias("jacc_q"),
            ),
            ["query_id"],
            [F.desc("jacc_q"), F.asc("doc_id")],
            _RRF_POOL,
            "lex_rank",
        )
        .withColumn("lex_rank", F.col("lex_rank").cast("bigint"))
        .select("query_id", "doc_id", "lex_rank")
    )
    e = _emb_normed(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _RRF_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    sem = (
        topk_per_group(
            e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("doc_id"),
                cosine_prenorm(
                    F.col("qemb"), F.col("emb"), F.col("qnrm"), F.col("nrm")
                ).alias("cos_sim"),
            ),
            ["query_id"],
            [F.desc("cos_sim"), F.asc("doc_id")],
            _RRF_POOL,
            "sem_rank",
        )
        .withColumn("sem_rank", F.col("sem_rank").cast("bigint"))
        .select("query_id", "doc_id", "sem_rank")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.expr(f"1048576 div ({_RRF_C} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1048576 div ({_RRF_C} + sem_rank)"), F.lit(0)
            )
        ).cast("bigint").alias("rrf_q"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_q"), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "query_id", "doc_id", "lex_rank", "sem_rank", "rrf_q",
            "fused_rank",
            (F.col("rrf_q").cast("double") / F.lit(1048576.0))
            .alias("rrf_score"),
        )
    )


def _rrf_sql() -> str:
    from .embeddings import _SQL_EMB_NORMED
    from ..functions.vectors import sql_cosine_prenorm

    return f"""
WITH toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, t.tok
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents), unnest(w) t(tok)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM toks GROUP BY 1),
inter AS (
  SELECT q.doc_id AS query_id, d.doc_id, CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks d JOIN toks q ON q.tok = d.tok AND q.doc_id < {_RRF_NQ}
              AND d.doc_id <> q.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, lex_rank FROM (
    SELECT i.query_id, i.doc_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY i.query_id
             ORDER BY (i.inter * 1048576) // (qs.sz + s.sz - i.inter) DESC,
                      i.doc_id) AS BIGINT) AS lex_rank
    FROM inter i
    JOIN sizes s ON s.doc_id = i.doc_id
    JOIN sizes qs ON qs.doc_id = i.query_id
  ) WHERE lex_rank <= {_RRF_POOL}
),
e AS MATERIALIZED ({_SQL_EMB_NORMED}),
sem AS (
  SELECT query_id, doc_id, sem_rank FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {sql_cosine_prenorm('q.emb', 'e.emb', 'q.nrm', 'e.nrm')}
                        DESC, e.vec_id) AS BIGINT) AS sem_rank
    FROM e JOIN e q ON q.vec_id < {_RRF_NQ} AND e.vec_id <> q.vec_id
  ) WHERE sem_rank <= {_RRF_POOL}
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank,
         CAST(COALESCE(1048576 // ({_RRF_C} + l.lex_rank), 0)
              + COALESCE(1048576 // ({_RRF_C} + s.sem_rank), 0) AS BIGINT)
           AS rrf_q
  FROM lex l FULL OUTER JOIN sem s
    ON s.query_id = l.query_id AND s.doc_id = l.doc_id
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_q, fused_rank,
       CAST(rrf_q AS DOUBLE) / 1048576.0 AS rrf_score
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf_q DESC, doc_id) AS BIGINT) AS fused_rank
  FROM fused
) WHERE fused_rank <= {_RRF_TOP}
"""


# ----------------------------------------------------------- quality AUC
# Language-bias audit of the heuristic quality score: exact ROC AUC of
# qscore as a classifier for "document is English" via the Mann-Whitney
# rank-sum identity AUC = (R1 − n1(n1+1)/2) / (n1·n0). An AUC far from
# 0.5 means the curation filter systematically re-weights languages — the
# fairness check a multilingual training-data pipeline must run before
# thresholding on quality. Exactness: ranks come from cumulative counts
# over the DISTINCT-score table (average rank over ties, doubled to stay
# integer), so everything is BIGINT until one final division. Scale
# shape: one groupBy(qscore) over the corpus, then a window over the
# bounded distinct-score table — no global sort of raw docs.


def q_doc_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    d = _qscored(docs).join(docs.select("doc_id", "lang"), "doc_id")
    grp = d.groupBy("qscore").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    w = Window.orderBy("qscore").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn("avg2", 2 * F.col("cum_before") + F.col("cnt") + 1)
    agg = ranked.agg(
        F.sum(F.col("pos") * F.col("avg2")).cast("bigint").alias("r1_2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    u2 = F.col("r1_2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        (
            u2.cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
        (
            u2.cast("double")
            / (F.col("n_pos") * F.col("n_neg")).cast("double")
            - F.lit(1).cast("double")
        ).alias("gini"),
    )


def _quality_auc_sql() -> str:
    return f"""
WITH d AS (
  SELECT q.doc_id, q.qscore, doc.lang
  FROM ({_qscored_sql()}) q JOIN documents doc USING (doc_id)
),
grp AS (
  SELECT qscore, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM d GROUP BY 1
),
ranked AS (
  SELECT *,
         COALESCE(CAST(SUM(cnt) OVER (ORDER BY qscore
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_before
  FROM grp
),
agg AS (
  SELECT CAST(SUM(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS r1_2,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       r1_2 - n_pos * (n_pos + 1) AS u2,
       CAST(r1_2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc,
       CAST(r1_2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(n_pos * n_neg AS DOUBLE) - CAST(1 AS DOUBLE) AS gini
FROM agg
"""


# ------------------------------------------------------------- Heaps' law
# Vocabulary-growth audit (Heaps' law V(n) ≈ K·n^β): distinct-token
# vocabulary measured at 8 prefix checkpoints of the doc_id-ordered
# corpus, with the growth exponent β fit by integer least squares on the
# fixed-point log2 grid (_qlog2_expr — exact in both engines). β tells a
# pipeline how token-vocab (and so BPE/embedding table) cost scales with
# corpus growth. Scale shape: vocabulary is touched once (min first-doc
# per token); checkpoint membership is an 8-row broadcast inequality
# join against the TOKEN table (not the corpus); the fit runs on 8 rows.

_HEAPS_K = 8


def q_doc_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    tok_first = (
        docs.select("doc_id", F.explode(_TOKENS()).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fr"))
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ks = spark.range(1, _HEAPS_K + 1).select(F.col("id").alias("k"))
    lattice = ks.join(F.broadcast(nd)).select(
        "k", F.expr(f"(nd * k) div {_HEAPS_K}").alias("n_docs")
    )
    pts = (
        tok_first.join(
            F.broadcast(lattice), F.col("fr") < F.col("n_docs")
        )
        .groupBy("k", "n_docs")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
        .select(
            "k",
            "n_docs",
            "vocab",
            F.expr(_qlog2_expr("n_docs", "spark")).cast("bigint").alias("x_q"),
            F.expr(_qlog2_expr("vocab", "spark")).cast("bigint").alias("y_q"),
        )
        # NOT persisted (round 11): the scan census flagged pts' double
        # consumption, but interleaved A/B read the persist ~10% SLOWER
        # (1.13 → 1.27 s med-of-5) — ReuseExchange already dedupes the
        # single shared aggregate here, and the cache write only adds a
        # pipeline break. Census hits need the A/B, not a blanket rule.
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x_q").cast("bigint").alias("sx"),
        F.sum("y_q").cast("bigint").alias("sy"),
        F.sum(F.col("x_q") * F.col("y_q")).cast("bigint").alias("sxy"),
        F.sum(F.col("x_q") * F.col("x_q")).cast("bigint").alias("sxx"),
    ).select(
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double")
        ).alias("heaps_beta")
    )
    return pts.join(F.broadcast(fit)).select(
        "k", "n_docs", "vocab", "x_q", "y_q", "heaps_beta"
    ).orderBy("k")


def _heaps_sql() -> str:
    qn = _qlog2_expr("n_docs", "duckdb")
    qv = _qlog2_expr("vocab", "duckdb")
    return f"""
WITH tok_first AS (
  SELECT t.tok, MIN(doc_id) AS fr
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents), unnest(w) t(tok)
  GROUP BY 1
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
lattice AS (
  SELECT t.i AS k, (nd * t.i) // {_HEAPS_K} AS n_docs
  FROM nd, unnest(range(1, {_HEAPS_K} + 1)) t(i)
),
pts AS (
  SELECT k, n_docs, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM tok_first JOIN lattice ON fr < n_docs
  GROUP BY 1, 2
),
ptsq AS (
  SELECT k, n_docs, vocab,
         CAST({qn} AS BIGINT) AS x_q, CAST({qv} AS BIGINT) AS y_q
  FROM pts
),
fit AS (
  SELECT CAST(
           (COUNT(*) * SUM(x_q * y_q) - SUM(x_q) * SUM(y_q)) AS DOUBLE
         ) / CAST(
           (COUNT(*) * SUM(x_q * x_q) - SUM(x_q) * SUM(x_q)) AS DOUBLE
         ) AS heaps_beta
  FROM ptsq
)
SELECT k, n_docs, vocab, x_q, y_q, heaps_beta
FROM ptsq, fit
ORDER BY k
"""


# ----------------------------------------------------------- lang-id eval
# Classifier-evaluation audit of the marker-token language identifier
# (q_doc_lang_id) against the labeled lang column: per-language
# precision / recall / F1 plus the overall accuracy — the quality gate
# before trusting the heuristic to route untagged corpora. All counts
# are exact integers; the metrics are single divisions (0-guarded, so a
# language never predicted yields 0.0 precision, not an engine-divergent
# 0/0). Scale shape: the lang-id scan plus two |langs|-row aggregates.


def q_doc_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = q_doc_lang_id(spark, sf_dir).select("lang", "pred_lang")
    per_true = preds.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )
    per_pred = preds.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_predicted")
    )
    tot = preds.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_right"),
    )
    rec = F.col("n_correct").cast("double") / F.col("n_docs").cast("double")
    prec = F.when(F.col("n_predicted") > 0,
                  F.col("n_correct").cast("double")
                  / F.col("n_predicted").cast("double")).otherwise(F.lit(0.0))
    return (
        per_true.join(F.broadcast(per_pred), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "n_correct",
            F.coalesce("n_predicted", F.lit(0)).cast("bigint")
            .alias("n_predicted"),
        )
        .join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_correct",
            "n_predicted",
            rec.alias("recall"),
            prec.alias("precision"),
            F.when(
                (rec + prec) > 0, 2 * prec * rec / (prec + rec)
            ).otherwise(F.lit(0.0)).alias("f1"),
            (F.col("n_right").cast("double") / F.col("n_total").cast("double"))
            .alias("overall_accuracy"),
        )
    )


def _langid_eval_sql() -> str:
    return f"""
WITH preds AS (
  SELECT lang, pred_lang FROM ({_langid_sql()}) q
),
per_true AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
  FROM preds GROUP BY 1
),
per_pred AS (
  SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_predicted
  FROM preds GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_right
  FROM preds
),
m AS (
  SELECT t.lang, t.n_docs, t.n_correct,
         COALESCE(p.n_predicted, 0) AS n_predicted,
         CAST(t.n_correct AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS recall,
         CASE WHEN COALESCE(p.n_predicted, 0) > 0
              THEN CAST(t.n_correct AS DOUBLE)
                     / CAST(p.n_predicted AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS precision
  FROM per_true t LEFT JOIN per_pred p USING (lang)
)
SELECT lang, n_docs, n_correct, n_predicted, recall, precision,
       CASE WHEN (recall + precision) > 0
            THEN 2 * precision * recall / (precision + recall)
            ELSE CAST(0 AS DOUBLE) END AS f1,
       CAST(n_right AS DOUBLE) / CAST(n_total AS DOUBLE) AS overall_accuracy
FROM m, tot
"""


# --------------------------------------------------------- calibration curve
# Reliability diagram for the quality score as an is-English predictor —
# the per-bin companion to q_doc_quality_auc's single-number rank
# statistic: fixed-width score bins (width 0.5 over the score's [0, 4]
# range), observed English rate per bin. AUC says the score RANKS
# languages apart; this says WHERE on the score axis the separation
# lives — the evidence for picking an actual quality threshold. Bin
# assignment is floor(2·qscore) on the engine-identical score double, so
# binning is exact. Scale shape: one narrow map + an ≤9-bin aggregate.

_CAL_BINS = 8


def q_doc_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    d = _qscored(docs).join(docs.select("doc_id", "lang"), "doc_id")
    binned = d.select(
        F.expr(
            f"least(greatest(CAST(floor(qscore * 2) AS BIGINT), 0),"
            f" {_CAL_BINS - 1})"
        ).alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_en").cast("bigint").alias("n_en"),
        )
        .select(
            "bin",
            (F.col("bin").cast("double") / F.lit(2.0)).alias("score_lo"),
            ((F.col("bin") + 1).cast("double") / F.lit(2.0)).alias("score_hi"),
            "n_docs",
            "n_en",
            (F.col("n_en").cast("double") / F.col("n_docs").cast("double"))
            .alias("en_rate"),
        )
    )


def _calibration_sql() -> str:
    return f"""
WITH d AS (
  SELECT q.qscore, doc.lang
  FROM ({_qscored_sql()}) q JOIN documents doc USING (doc_id)
),
binned AS (
  SELECT LEAST(GREATEST(CAST(floor(qscore * 2) AS BIGINT), 0),
               {_CAL_BINS - 1}) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
  FROM d
)
SELECT bin,
       CAST(bin AS DOUBLE) / CAST(2.0 AS DOUBLE) AS score_lo,
       CAST(bin + 1 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS score_hi,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_en) AS BIGINT) AS n_en,
       CAST(SUM(is_en) AS DOUBLE) / COUNT(*) AS en_rate
FROM binned GROUP BY 1
"""


# --------------------------------------------------------- threshold sweep
# Curation yield curve: for each candidate quality threshold (the
# calibration bins' lower edges), the fraction of documents and of
# TOKENS retained by "keep qscore ≥ τ" — the two axes a pipeline trades
# when it turns the quality knob (corpus size vs quality floor). Built
# as a cumulative suffix sum over the per-bin aggregate, so the corpus
# is touched once no matter how many thresholds are swept. Doc and
# token counts are integers; retention fractions are one division each.


def q_doc_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    d = _qscored(docs)
    binned = d.select(
        F.expr(
            f"least(greatest(CAST(floor(qscore * 2) AS BIGINT), 0),"
            f" {_CAL_BINS - 1})"
        ).alias("bin"),
        "n_tokens",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per_bin.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("n_tokens").cast("bigint").alias("tt"),
    )
    return (
        per_bin.select(
            "bin",
            F.sum("n_docs").over(w).cast("bigint").alias("docs_kept"),
            F.sum("n_tokens").over(w).cast("bigint").alias("tokens_kept"),
        )
        .join(F.broadcast(tot))
        .select(
            (F.col("bin").cast("double") / F.lit(2.0)).alias("threshold"),
            "docs_kept",
            "tokens_kept",
            (F.col("docs_kept").cast("double") / F.col("td").cast("double"))
            .alias("doc_retention"),
            (F.col("tokens_kept").cast("double") / F.col("tt").cast("double"))
            .alias("token_retention"),
        )
    )


def _threshold_sweep_sql() -> str:
    return f"""
WITH d AS ({_qscored_sql()}),
binned AS (
  SELECT LEAST(GREATEST(CAST(floor(qscore * 2) AS BIGINT), 0),
               {_CAL_BINS - 1}) AS bin,
         n_tokens
  FROM d
),
per_bin AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM binned GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
         CAST(SUM(n_tokens) AS BIGINT) AS tt
  FROM per_bin
),
cum AS (
  SELECT bin,
         CAST(SUM(n_docs) OVER (ORDER BY bin DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_kept,
         CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_kept
  FROM per_bin
)
SELECT CAST(bin AS DOUBLE) / CAST(2.0 AS DOUBLE) AS threshold,
       docs_kept, tokens_kept,
       CAST(docs_kept AS DOUBLE) / CAST(td AS DOUBLE) AS doc_retention,
       CAST(tokens_kept AS DOUBLE) / CAST(tt AS DOUBLE) AS token_retention
FROM cum, tot
"""




# ------------------------------------------------------- Gopher rule battery
# The Gopher/MassiveText quality-filter rule set (Rae et al. 2021, table
# A1), adapted to this corpus: per-doc boolean rules on word count, mean
# word length, alphabetic-word ratio, stopword presence, and the two
# repetition rules (most-common-word fraction, duplicate-bigram
# fraction), rolled up to per-source pass rates. Every rule is an exact
# INTEGER comparison (cnt*k <= m*total — no float ratios), so both
# engines agree bit-for-bit, including on degenerate docs (empty text
# tokenizes to [''], which fails r_alpha/r_meanlen honestly).
#
# Scale shape: TWO passes over the exploded tokens — (a) a two-level
# aggregation (doc,word)->doc that computes token stats AND the word
# mode in one tree (partial agg combines repeated words map-side before
# the shuffle), (b) the adjacent-bigram window — then one
# broadcast-sized per-source rollup. No all-pairs anything; the explode
# is the same heavy shuffle every dedup query already pays.

_GR_WC_LO, _GR_WC_HI = 10, 90  # word-count bounds
_GR_MWL_LO, _GR_MWL_HI = 2, 8  # mean-word-length bounds (exact: lo*wc<=sum<=hi*wc)


def q_doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    toks = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    stats = (
        toks.groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("wf").cast("bigint").alias("wc"),
            F.sum(F.col("wf") * F.length("w")).cast("bigint").alias("sum_len"),
            F.sum(F.when(F.col("w").rlike("[a-z]"), F.col("wf")).otherwise(0))
            .cast("bigint")
            .alias("n_alpha"),
            F.sum(F.when(F.col("w").isin(_STOPWORDS), F.col("wf")).otherwise(0))
            .cast("bigint")
            .alias("n_stop"),
            F.max("wf").cast("bigint").alias("max_wf"),
        )
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select("doc_id", "w", F.lead("w").over(wnd).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_bg"),
            F.count_distinct("w", "nxt").alias("dist_bg"),
        )
    )
    per_doc = (
        stats.join(bg, "doc_id", "left")
        .select(
            "source",
            (
                (F.col("wc") >= _GR_WC_LO) & (F.col("wc") <= _GR_WC_HI)
            ).alias("r_wordcount"),
            (
                (F.col("sum_len") >= _GR_MWL_LO * F.col("wc"))
                & (F.col("sum_len") <= _GR_MWL_HI * F.col("wc"))
            ).alias("r_meanlen"),
            (F.col("n_alpha") * 10 >= F.col("wc") * 8).alias("r_alpha"),
            (F.col("n_stop") >= 2).alias("r_stop"),
            (F.col("max_wf") * 5 <= F.col("wc")).alias("r_rep_word"),
            (
                F.col("total_bg").isNotNull()
                & (
                    (F.coalesce("total_bg", F.lit(0)) - F.coalesce("dist_bg", F.lit(0)))
                    * 5
                    <= F.coalesce("total_bg", F.lit(0))
                )
            ).alias("r_rep_bigram"),
        )
    )
    rules = [
        "r_wordcount", "r_meanlen", "r_alpha", "r_stop", "r_rep_word",
        "r_rep_bigram",
    ]
    aggs = [
        F.sum(F.when(F.col(r), 1).otherwise(0)).cast("bigint").alias(f"n_{r}")
        for r in rules
    ]
    all_pass = F.lit(True)
    for r in rules:
        all_pass = all_pass & F.col(r)
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *aggs,
        F.sum(F.when(all_pass, 1).otherwise(0)).cast("bigint").alias("n_pass_all"),
    )


def _gopher_rules_sql() -> str:
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, source, CAST(i AS BIGINT) AS pos, w[i] AS w
  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
stats AS (
  SELECT doc_id, source, COUNT(*) AS wc,
         CAST(SUM(length(w)) AS BIGINT) AS sum_len,
         CAST(SUM(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_alpha,
         CAST(SUM(CASE WHEN w IN ({sw}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stop
  FROM toks GROUP BY doc_id, source
),
mode AS (
  SELECT doc_id, CAST(MAX(wf) AS BIGINT) AS max_wf
  FROM (SELECT doc_id, w, COUNT(*) AS wf FROM toks GROUP BY doc_id, w)
  GROUP BY doc_id
),
bg AS (
  SELECT doc_id, COUNT(*) AS total_bg,
         COUNT(DISTINCT (w, nxt)) AS dist_bg
  FROM (SELECT doc_id, w,
               LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM toks)
  WHERE nxt IS NOT NULL GROUP BY doc_id
),
per_doc AS (
  SELECT s.source,
         (s.wc >= {_GR_WC_LO} AND s.wc <= {_GR_WC_HI}) AS r_wordcount,
         (s.sum_len >= {_GR_MWL_LO} * s.wc
          AND s.sum_len <= {_GR_MWL_HI} * s.wc) AS r_meanlen,
         (s.n_alpha * 10 >= s.wc * 8) AS r_alpha,
         (s.n_stop >= 2) AS r_stop,
         (m.max_wf * 5 <= s.wc) AS r_rep_word,
         (b.total_bg IS NOT NULL
          AND (COALESCE(b.total_bg, 0) - COALESCE(b.dist_bg, 0)) * 5
              <= COALESCE(b.total_bg, 0)) AS r_rep_bigram
  FROM stats s JOIN mode m USING (doc_id)
  LEFT JOIN bg b USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r_wordcount THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r_wordcount,
       CAST(SUM(CASE WHEN r_meanlen THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r_meanlen,
       CAST(SUM(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_r_alpha,
       CAST(SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_r_stop,
       CAST(SUM(CASE WHEN r_rep_word THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r_rep_word,
       CAST(SUM(CASE WHEN r_rep_bigram THEN 1 ELSE 0 END) AS BIGINT)
         AS n_r_rep_bigram,
       CAST(SUM(CASE WHEN r_wordcount AND r_meanlen AND r_alpha AND r_stop
                      AND r_rep_word AND r_rep_bigram
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM per_doc GROUP BY source
"""


# ------------------------------------------------------------- TextRank
# TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over the
# word co-occurrence graph (adjacent-token pairs, undirected via
# symmetric directed edges, weight = corpus co-occurrence count), 3
# damped power iterations, top-10 words. Complements RAKE (q_doc_rake)
# with the graph-centrality ranking the paper made standard.
#
# Determinism mirrors q_ev_pagerank (events_sketches.py): transition
# probabilities are single IEEE divisions of exact counts; each
# iteration's per-node contribution sum is a sequential fold in src
# order, so both engines walk bit-identical rank vectors.
#
# Scale shape: the heavy work is ONE corpus tokenize + adjacent-pair
# count (same explode shuffle as the dedup family); the rank loop runs
# on the vocabulary-sized node/edge tables with broadcast joins — no
# corpus data in the loop.

_TR_DAMP = 0.85
_TR_ITERS = 3
_TR_K = 10


def q_doc_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    # array-native adjacent pairs (round 11): identical row multiset to
    # the previous posexplode + lead-window shape, minus the sort
    pairs = _bigram_df(docs, F.split("text", " "), "doc_id").select(
        F.col("w1").alias("w"), F.col("w2").alias("nxt")
    )
    # one corpus pass: emit both edge directions inline instead of a
    # union of two selects (which would re-run the explode twice)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("w").alias("src"), F.col("nxt").alias("dst")),
                    F.struct(F.col("nxt").alias("src"), F.col("w").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # persist: the vocabulary-bounded edge table feeds out-degrees,
        # p, nodes, AND (via base) every rank iteration — unpersisted,
        # each of those re-ran the corpus explode+count (round 11)
        .transform(_tp)
    )
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    p = (
        edges.join(out, "src")
        .select(
            "src", "dst", (F.col("cnt").cast("double") / F.col("out_cnt")).alias("p")
        )
        .transform(_tp)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    # single-row cross join: N reaches every node row; persisted — base
    # seeds rank 0 AND re-enters every damped iteration (4 plan branches)
    base = nodes.join(n).transform(_tp)
    ranks = base.select("node", (F.lit(1.0) / F.col("n_nodes")).alias("r"))
    for _ in range(_TR_ITERS):
        contrib = p.join(
            F.broadcast(ranks.select(F.col("node").alias("src"), "r")), "src"
        ).select("dst", "src", (F.col("r") * F.col("p")).alias("c"))
        agg = contrib.groupBy("dst").agg(
            F.aggregate(
                F.expr("transform(array_sort(collect_list(struct(src, c))), t -> t.c)"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s")
        )
        ranks = base.join(F.broadcast(agg), base["node"] == agg["dst"], "left").select(
            "node",
            (
                (F.lit(1.0) - F.lit(_TR_DAMP)) / F.col("n_nodes")
                + F.lit(_TR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    # Top-k FIRST via orderBy().limit() (TakeOrderedAndProject,
    # partition-parallel), THEN the row_number window over the k
    # surviving rows — the q_doc_weighted_sample pattern. The previous
    # shape ranked the whole |vocab| table through one unpartitioned
    # window task. (r desc, node) is a total order (node unique), so
    # the k-row set and ranks are deterministic.
    topk = ranks.orderBy(F.col("r").desc(), F.col("node")).limit(_TR_K)
    wk = Window.orderBy(F.col("r").desc(), F.col("node"))
    return (
        topk.withColumn("kw_rank", F.row_number().over(wk).cast("bigint"))
        .select("kw_rank", F.col("node").alias("word"), F.col("r").alias("score"))
    )


def _textrank_sql() -> str:
    it = """
SELECT node,
       (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE)) / n_nodes
         + CAST({d} AS DOUBLE) * COALESCE(s, CAST(0.0 AS DOUBLE)) AS r
FROM nodes CROSS JOIN n LEFT JOIN (
  SELECT dst, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                       list(c ORDER BY src)),
                          (acc, x) -> acc + x) AS s
  FROM (SELECT dst, src, r * p AS c
        FROM p JOIN {prev} ON {prev}.node = p.src)
  GROUP BY dst
) agg ON agg.dst = nodes.node"""
    ctes = ",\n".join(
        f"r{i + 1} AS ({it.format(d=_TR_DAMP, prev=f'r{i}')})"
        for i in range(_TR_ITERS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
pairs AS (
  SELECT w, nxt FROM (
    SELECT w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks)
  WHERE nxt IS NOT NULL
),
edges AS (
  SELECT src, dst, COUNT(*) AS cnt FROM (
    SELECT w AS src, nxt AS dst FROM pairs
    UNION ALL
    SELECT nxt AS src, w AS dst FROM pairs)
  GROUP BY src, dst
),
outd AS (SELECT src, SUM(cnt) AS out_cnt FROM edges GROUP BY src),
p AS (SELECT src, dst, CAST(cnt AS DOUBLE) / out_cnt AS p
      FROM edges JOIN outd USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n_nodes AS r
       FROM nodes CROSS JOIN n),
{ctes}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS BIGINT) AS kw_rank,
       node AS word, r AS score
FROM r{_TR_ITERS}
QUALIFY kw_rank <= {_TR_K}
"""


# ----------------------------------------------------------- readability
# Syllable-based readability battery per source, adapted from the
# Flesch/SMOG family to this corpus (word streams, no sentence
# boundaries): syllables are approximated as vowel-group runs
# ([aeiouy]+, min 1 per word) — the standard cheap estimator — and the
# sentence-level terms are replaced by per-doc polysyllable density
# ("hard doc" = >20% words with >=3 syllables, the SMOG ingredient).
# All outputs are exact integers (counts and integer-division basis
# points), so the cross-engine hash is exact.
#
# Scale shape: the syllable pass is a PURE NARROW MAP — per-doc stats
# come from higher-order functions over the split array (no explode, no
# corpus shuffle at all); the only shuffle is the |sources|-row rollup.
# That is the plan to want at 100 TB: the scan streams once through
# whole-stage codegen and reduces to a broadcast-sized table.

_RD_POLY = 3  # >= this many syllables = polysyllabic (SMOG ingredient)
_RD_LONG = 7  # >= this many chars = long word (LIX ingredient)


def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    per_doc = docs.select(
        "source",
        F.expr(
            "transform(split(text, ' '), "
            "w -> greatest(regexp_count(w, '[aeiouy]+'), 1))"
        ).alias("syls"),
        F.split("text", " ").alias("arr"),
    ).select(
        "source",
        F.size("arr").cast("bigint").alias("wc"),
        F.expr("aggregate(syls, 0L, (a, x) -> a + x)").alias("sum_syl"),
        F.expr(f"size(filter(syls, s -> s >= {_RD_POLY}))")
        .cast("bigint")
        .alias("n_poly"),
        F.expr(f"size(filter(arr, w -> length(w) >= {_RD_LONG}))")
        .cast("bigint")
        .alias("n_long"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("wc").cast("bigint").alias("n_words"),
        F.sum("sum_syl").cast("bigint").alias("n_syllables"),
        F.sum("n_poly").cast("bigint").alias("n_poly"),
        F.sum("n_long").cast("bigint").alias("n_long"),
        F.sum(F.when(F.col("n_poly") * 5 >= F.col("wc"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hard_docs"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_syllables",
        "n_poly",
        "n_long",
        "n_hard_docs",
        F.expr("n_syllables * 100 div n_words").alias("syl_per_word_cents"),
        F.expr("n_poly * 10000 div n_words").alias("poly_bp"),
        F.expr("n_long * 10000 div n_words").alias("long_bp"),
    )


_READABILITY_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(arr) AS BIGINT) AS wc,
         CAST(list_sum(list_transform(arr,
              x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1)))
           AS BIGINT) AS sum_syl,
         CAST(len(list_filter(list_transform(arr,
              x -> len(regexp_extract_all(x, '[aeiouy]+'))),
              s -> greatest(s, 1) >= {_RD_POLY})) AS BIGINT) AS n_poly,
         CAST(len(list_filter(arr, w -> length(w) >= {_RD_LONG}))
           AS BIGINT) AS n_long
  FROM (SELECT source, string_split(text, ' ') AS arr FROM documents)
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(wc) AS BIGINT) AS n_words,
         CAST(SUM(sum_syl) AS BIGINT) AS n_syllables,
         CAST(SUM(n_poly) AS BIGINT) AS n_poly,
         CAST(SUM(n_long) AS BIGINT) AS n_long,
         CAST(SUM(CASE WHEN n_poly * 5 >= wc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hard_docs
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_syllables, n_poly, n_long, n_hard_docs,
       n_syllables * 100 // n_words AS syl_per_word_cents,
       n_poly * 10000 // n_words AS poly_bp,
       n_long * 10000 // n_words AS long_bp
FROM agg
"""
