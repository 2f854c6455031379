"""Curation/sampling family over the `documents` table: mixture /
Neyman / weighted / upsampling, train-test and leakage-aware splits,
sequence packing, negatives, dataset card, DSIR, DoReMi domain
reweighting, jackknife error bars, source overlap, upsert/MERGE,
length histogram.

Split from the original single documents module (round 6) — see
`documents.py` for the registry; shared hashing/tokenising primitives
live in `documents_shared.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import sql_dsum, tracked_persist as _tp
from .documents_shared import _h, _sql_h, _TOKENS, SQL_TOKENS, _docs_par, _STOPWORDS, _qlog2_expr
from .documents_dedup import _dup_edges, _reach_ctes
from .documents_text import _qscored, _qscored_sql

# -------------------------------------------------------- negative sampling
# Deterministic negative sampling for contrastive training: each anchor
# doc gets k pseudo-random negatives via md5-derived modular offsets in
# [1, N-1], so a negative can never be its own anchor and the sample is
# reproducible across runs and engines (no RNG). Hydrating the negative's
# metadata is one join keyed by the sampled ids — the only shuffled rows
# are the k x |anchors| samples, never the corpus.

_NEG_ANCHORS = 50
_NEG_K = 3


def q_doc_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    n = docs.agg(F.count(F.lit(1)).alias("n_total"))
    anchors = docs.filter(F.col("doc_id") < _NEG_ANCHORS).select("doc_id", "text")
    sampled = (
        anchors.join(n)
        .select(
            F.col("doc_id").alias("anchor_id"),
            "text",
            "n_total",
            F.explode(F.array(*[F.lit(j) for j in range(_NEG_K)])).alias("neg_rank"),
        )
        .select(
            "anchor_id",
            "neg_rank",
            (
                (
                    F.col("anchor_id")
                    + F.pmod(
                        _h(F.concat(F.col("text"), F.lit(":"), F.col("neg_rank").cast("string"))),
                        F.col("n_total") - 1,
                    )
                    + 1
                )
                % F.col("n_total")
            ).alias("neg_id"),
        )
    )
    hydr = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return sampled.join(hydr, "neg_id").select(
        "anchor_id",
        F.col("neg_rank").cast("bigint").alias("neg_rank"),
        "neg_id",
        "neg_lang",
    )


_NEGATIVES_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n_total FROM documents),
anchors AS (SELECT doc_id, text FROM documents WHERE doc_id < {_NEG_ANCHORS}),
sampled AS (
  SELECT doc_id AS anchor_id, j AS neg_rank,
         (doc_id + ({_sql_h("text || ':' || CAST(j AS VARCHAR)")} % (n_total - 1))
          + 1) % n_total AS neg_id
  FROM anchors CROSS JOIN n, unnest(range(0, {_NEG_K})) t(j)
)
SELECT anchor_id, CAST(neg_rank AS BIGINT) AS neg_rank, neg_id,
       d.lang AS neg_lang
FROM sampled JOIN documents d ON d.doc_id = sampled.neg_id
"""


# ---------------------------------------------------------- dataset card
# One-row-per-language dataset card: the summary artifact a curation
# pipeline publishes alongside a release — volume, token budget, exact
# duplication rate, and embedding coverage (documents ⋈ embeddings on
# doc_id = vec_id). Two aggregates and one count join; every measure is
# exact integers plus single divisions.


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_TOKENS()).cast("bigint")).alias("total_tokens"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.sum("n_chars").alias("total_chars"),
    )
    emb = T(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("doc_id"))
    cov = (
        docs.select("lang", "doc_id")
        .join(emb, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_embedded"))
    )
    return (
        stats.join(F.broadcast(cov), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "total_chars",
            (
                1.0
                - F.col("n_unique").cast("double") / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            F.coalesce("n_embedded", F.lit(0)).alias("n_embedded"),
            (
                F.coalesce("n_embedded", F.lit(0)).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("embed_coverage"),
        )
    )


_DATASET_CARD_SQL = f"""
WITH stats AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(CAST(len({SQL_TOKENS}) AS BIGINT)) AS BIGINT) AS total_tokens,
         COUNT(DISTINCT md5(text)) AS n_unique,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
),
cov AS (
  SELECT lang, COUNT(*) AS n_embedded
  FROM documents d
  WHERE EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
  GROUP BY lang
)
SELECT lang, n_docs, total_tokens, total_chars,
       1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
       COALESCE(n_embedded, 0) AS n_embedded,
       CAST(COALESCE(n_embedded, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS embed_coverage
FROM stats LEFT JOIN cov USING (lang)
"""


# ------------------------------------------------------- sequence packing
# Concat-and-chunk sequence packing: documents are laid end-to-end per
# language in doc_id order and cut into fixed token-budget bins (the
# packing step that turns a curated corpus into training sequences).
# bin = exclusive-cumulative-token-count div budget — computed
# partition-parallel via grouped_exclusive_prefix_sum (round 7; a
# per-lang window cumsum would put each language's whole corpus in one
# task), then one aggregate; deterministic because the layout order
# (lang, doc_id) is total. Reported per bin: docs, tokens, fill ratio.

_PACK_BUDGET = 256


def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    d = docs.select(
        "lang", "doc_id", F.size(_TOKENS()).cast("bigint").alias("n_tokens")
    )
    # per-lang exclusive prefix token sum, PARTITION-PARALLEL (round 7):
    # lang is a low-cardinality key, so the previous partitionBy(lang)
    # running-sum window put each language's whole corpus in one task;
    # grouped_exclusive_prefix_sum keeps the packing scan parallel with
    # only a P×|langs| offset table on the driver.
    from ..catalog import table_rows
    from ..core.spark_engine import grouped_exclusive_prefix_sum

    # n_rows: one row per document — metadata-count gate picks one small
    # window below TWO_PHASE_MIN_ROWS, the two-phase plan above
    binned = grouped_exclusive_prefix_sum(
        spark, d, ["lang"], ["doc_id"], "n_tokens", "_pre",
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).withColumn(
        "bin", F.expr(f"CAST(_pre div {_PACK_BUDGET} AS BIGINT)")
    ).drop("_pre")
    return binned.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / float(_PACK_BUDGET)).alias("fill"),
    )


_PACK_SQL = f"""
WITH d AS (
  SELECT lang, doc_id, CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents
),
binned AS (
  SELECT lang, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
               - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM d
)
SELECT lang, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_BUDGET} AS fill
FROM binned GROUP BY lang, bin
"""


# ------------------------------------------------------- length histogram
# Fixed-width document-length histogram per language — the distribution
# profile behind truncation/packing decisions (sequence-length budgeting).
# Bucketing is integer division of an exact column; one aggregate.

_HIST_WIDTH = 100  # chars per bucket


def q_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    b = F.expr(f"CAST(n_chars div {_HIST_WIDTH} AS BIGINT)")
    return (
        docs.withColumn("bucket", b)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


_LENGTH_HIST_SQL = f"""
SELECT lang, CAST(n_chars // {_HIST_WIDTH} AS BIGINT) AS bucket, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY 1, 2
"""


# ------------------------------------------------------- upsampling
# Domain up-sampling (epochs per language): each doc is replicated
# factor-many times with a copy index — the "repeat high-quality domains
# N epochs" step of a data-mixing recipe, as a narrow explode (no
# shuffle until the audit aggregate). The checksum hashes (text, copy)
# so downstream can verify the exact replicated multiset, not just
# counts.

_UP_FACTORS = {"en": 1, "de": 2, "es": 3, "fr": 2, "zh": 4}
_UP_DEFAULT = 1


def q_doc_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    factor = F.lit(_UP_DEFAULT)
    for lang, f in _UP_FACTORS.items():
        factor = F.when(F.col("lang") == lang, f).otherwise(factor)
    d = (
        docs.withColumn("factor", factor)
        .withColumn("copy_idx", F.explode(F.expr("sequence(1, factor)")))
        .withColumn(
            "h", _h(F.concat(F.col("text"), F.lit(":"), F.col("copy_idx").cast("string")))
        )
    )
    return d.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("factor").alias("factor"),
        F.count(F.lit(1)).alias("n_out"),
        F.expr("bit_xor(h)").alias("checksum"),
    )


def _upsample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {f}" for lang, f in _UP_FACTORS.items()
    )
    return f"""
WITH d AS (
  SELECT lang, doc_id,
         {_sql_h(f"text || ':' || CAST(copy_idx AS VARCHAR)")} AS h,
         factor
  FROM (
    SELECT lang, doc_id, text,
           CASE lang {cases} ELSE {_UP_DEFAULT} END AS factor
    FROM documents
  ), unnest(range(1, factor + 1)) t(copy_idx)
)
SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, MAX(factor) AS factor,
       COUNT(*) AS n_out, bit_xor(h) AS checksum
FROM d GROUP BY lang
"""


# --------------------------------------------- DoReMi domain reweighting
# Domain-mixture reweighting in the DoReMi spirit (Xie et al. 2023,
# arXiv:2305.10429): upweight domains (`source`) whose documents score
# WORSE than the corpus average under the proxy model — here the same
# corpus-trained bigram LM as q_doc_lm_score/ccnet, standing in for
# DoReMi's proxy-model excess loss. w_raw(d) = token_share(d) ·
# (1 + α·excess(d)) with excess = relative fluency deficit clipped at 0,
# normalized to a mixture over domains, plus the implied per-domain
# document budget for a resampled corpus.
#
# Determinism without transcendentals: per-doc scores are order-pinned
# folds QUANTIZED to a 2^20 grid (floor → exact BIGINT), so every domain
# aggregate is integer; the remaining double ops are single IEEE
# operations on identical inputs. The 20-domain normalizer is an
# order-pinned fold. Scale: model counts are map-side combined; domain
# table is |sources| rows; normalizer is a single-row broadcast.

_DRW_ALPHA = 4
_DRW_Q = 1 << 20


def q_doc_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import ofold_sum
    from .documents_shared import _bigram_df

    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("w"))
    # array-native bigrams (round 11): identical rows to the previous
    # posexplode + lead-window shape, minus the sort (guide §2.4)
    bi = _bigram_df(docs, _TOKENS(), "doc_id", "source").transform(_tp)
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
        scored.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.expr("transform(array_sort(collect_list(struct(pos, p))), t -> t.p)"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("psum"),
        )
        .select(
            "doc_id", "source", "n_bigrams",
            F.floor((F.col("psum") / F.col("n_bigrams")) * F.lit(float(_DRW_Q)))
            .cast("bigint")
            .alias("score_q"),
        )
    )
    # persist: dom (|sources| rows) feeds BOTH the totals aggregate and
    # the join's left side — without it the whole scored→perdoc fold
    # pipeline (the expensive part) evaluates twice (round 11)
    dom = perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.sum("score_q").cast("bigint").alias("sq"),
    ).transform(_tp)
    tot = dom.agg(
        F.sum("n_docs").cast("bigint").alias("t_docs"),
        F.sum("n_bigrams").cast("bigint").alias("t_bigrams"),
        F.sum("sq").cast("bigint").alias("t_sq"),
    )
    j = (
        dom.join(F.broadcast(tot))  # single-row totals cross join
        .withColumn("avg_q", F.col("sq").cast("double") / F.col("n_docs"))
        .withColumn("c_avg", F.col("t_sq").cast("double") / F.col("t_docs"))
        .withColumn(
            "excess",
            F.greatest(
                F.lit(0.0), (F.col("c_avg") - F.col("avg_q")) / F.col("c_avg")
            ),
        )
        .withColumn(
            "w_raw",
            (F.col("n_bigrams").cast("double") / F.col("t_bigrams"))
            * (F.lit(1.0) + F.lit(float(_DRW_ALPHA)) * F.col("excess")),
        )
    ).transform(_tp)
    # NULL convention (degenerate-suite seeds): a NULL source would take
    # opposite ends of the two engines' fold order (Spark struct sort vs
    # DuckDB ORDER BY, NULLS FIRST vs LAST) and drift the normalizer by
    # an ulp — pin it with an empty-string fold key ('' is not a
    # generator source value; only fold ORDER, not output, changes).
    z = j.withColumn("src_k", F.coalesce("source", F.lit(""))).agg(
        ofold_sum("src_k", "w_raw").alias("z")
    )
    return j.join(F.broadcast(z)).select(  # single-row normalizer cross join
        "source",
        "n_docs",
        "n_bigrams",
        (F.col("avg_q") / F.lit(float(_DRW_Q))).alias("avg_fluency"),
        "excess",
        (F.col("w_raw") / F.col("z")).alias("weight"),
        F.floor((F.col("w_raw") / F.col("z")) * F.col("t_docs"))
        .cast("bigint")
        .alias("suggested_docs"),
    )


def _domain_reweight_sql() -> str:
    from ._util import sql_ofold_sum

    return f"""
WITH toks AS (
  SELECT doc_id, source, CAST(i - 1 AS INT) AS pos, w[i] AS w
  FROM (SELECT doc_id, source, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) + 1)) t(i)
),
bi AS (
  SELECT doc_id, source, pos, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
scored AS (
  SELECT b.doc_id, b.source, b.pos,
         CAST(COALESCE(c12, 0) + 1 AS DOUBLE) / (COALESCE(c1, 0) + v) AS p
  FROM bi b
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  CROSS JOIN vocab
),
perdoc AS (
  SELECT doc_id, source, COUNT(*) AS n_bigrams,
         CAST(FLOOR((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                              list(p ORDER BY pos)),
                                 (acc, x) -> acc + x) / COUNT(*))
                    * CAST({_DRW_Q} AS DOUBLE)) AS BIGINT) AS score_q
  FROM scored GROUP BY doc_id, source
),
dom AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
         CAST(SUM(score_q) AS BIGINT) AS sq
  FROM perdoc GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
         CAST(SUM(n_bigrams) AS BIGINT) AS t_bigrams,
         CAST(SUM(sq) AS BIGINT) AS t_sq
  FROM dom
),
j AS (
  SELECT source, n_docs, n_bigrams, t_docs, t_bigrams,
         CAST(sq AS DOUBLE) / n_docs AS avg_q,
         CAST(t_sq AS DOUBLE) / t_docs AS c_avg
  FROM dom CROSS JOIN tot
),
j2 AS (
  SELECT *, GREATEST(0.0, (c_avg - avg_q) / c_avg) AS excess
  FROM j
),
j3 AS (
  SELECT *,
         (CAST(n_bigrams AS DOUBLE) / t_bigrams)
           * (1.0 + CAST({_DRW_ALPHA} AS DOUBLE) * excess) AS w_raw
  FROM j2
),
z AS (SELECT {sql_ofold_sum("COALESCE(source, '')", 'w_raw')} AS z FROM j3)
SELECT source, n_docs, n_bigrams,
       avg_q / CAST({_DRW_Q} AS DOUBLE) AS avg_fluency,
       excess,
       w_raw / z AS weight,
       CAST(FLOOR((w_raw / z) * t_docs) AS BIGINT) AS suggested_docs
FROM j3 CROSS JOIN z
"""


# --------------------------------------------------- leakage-aware split
# Dedup-aware train/test splitting: the naive content-hash split scatters
# members of a duplicate cluster across both sides — test-set leakage
# that silently inflates eval scores. The group-aware split hashes the
# CLUSTER representative instead, so every near-dup group lands on one
# side and cross-split duplicate pairs are provably zero. Output is the
# audit row: duplicate-pair leakage under both schemes plus the side
# counts (group-aware pays a tiny train-fraction wobble for zero
# leakage). Scale: the edges/labels are the attested dedup pipeline; the
# audit itself is two hash maps + one pair join.


def q_doc_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cc import connected_components

    edges = _dup_edges(spark, sf_dir).transform(_tp)
    labels = connected_components(edges).withColumnRenamed("label", "grp0")
    d = (
        _docs_par(spark, sf_dir)
        .select("doc_id", _h(F.col("text")).alias("h"))
        .join(labels, "doc_id", "left")
        .withColumn("grp", F.coalesce("grp0", F.col("doc_id")))
        .withColumn(
            "naive_train", F.pmod(F.col("h"), F.lit(_SPLIT_MOD)) < _SPLIT_MOD - 1
        )
        .withColumn(
            "group_train",
            F.pmod(_h(F.col("grp").cast("string")), F.lit(_SPLIT_MOD))
            < _SPLIT_MOD - 1,
        )
        .transform(_tp)  # feeds totals + both pair-join sides
    )
    pa = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("naive_train").alias("na"),
        F.col("group_train").alias("ga"),
    )
    pb = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("naive_train").alias("nb"),
        F.col("group_train").alias("gb"),
    )
    pj = (
        edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
        .join(pa, "doc_a")
        .join(pb, "doc_b")
    )
    stats = pj.agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.sum((F.col("na") != F.col("nb")).cast("int"))
        .cast("bigint")
        .alias("naive_leaked"),
        F.sum((F.col("ga") != F.col("gb")).cast("int"))
        .cast("bigint")
        .alias("group_leaked"),
    )
    totals = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("naive_train").cast("int")).cast("bigint").alias("n_train_naive"),
        F.sum(F.col("group_train").cast("int")).cast("bigint").alias("n_train_group"),
    )
    return totals.join(F.broadcast(stats))  # two single-row frames


def _leakage_split_sql() -> str:
    gh = _sql_h("CAST(grp AS VARCHAR)")
    return f"""
WITH RECURSIVE
{_reach_ctes()},
d0 AS (SELECT doc_id, {_sql_h('text')} AS h FROM documents),
g AS (
  SELECT d0.doc_id, d0.h, COALESCE(c.cluster_id, d0.doc_id) AS grp
  FROM d0 LEFT JOIN clusters c USING (doc_id)
),
s AS (
  SELECT doc_id, h % {_SPLIT_MOD} < {_SPLIT_MOD - 1} AS naive_train,
         {gh} % {_SPLIT_MOD} < {_SPLIT_MOD - 1} AS group_train
  FROM g
),
pj AS (
  SELECT sa.naive_train AS na, sa.group_train AS ga,
         sb.naive_train AS nb, sb.group_train AS gb
  FROM e0
  JOIN s sa ON e0.src = sa.doc_id
  JOIN s sb ON e0.dst = sb.doc_id
),
stats AS (
  SELECT COUNT(*) AS n_dup_pairs,
         CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
           AS naive_leaked,
         CAST(SUM(CASE WHEN ga <> gb THEN 1 ELSE 0 END) AS BIGINT)
           AS group_leaked
  FROM pj
),
totals AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN naive_train THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train_naive,
         CAST(SUM(CASE WHEN group_train THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train_group
  FROM s
)
SELECT n_docs, n_train_naive, n_train_group, n_dup_pairs, naive_leaked,
       group_leaked
FROM totals CROSS JOIN stats
"""


# --------------------------------------------------- mixture sampling
# Deterministic hash-stratified sampling: per-language keep rates (the
# "data mixture" step of a training pipeline), decided by a content-hash
# bucket so the choice is reproducible across runs/engines and identical
# for identical texts (plays well with dedup). Pure narrow map — no
# shuffle at any scale; the predicate runs at scan time.

_MIX_RATES = {"en": 20, "de": 50, "es": 60, "fr": 70, "zh": 40}
_MIX_DEFAULT = 80


def q_doc_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for lg, r in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("bucket", _h(F.col("text")) % 100)
        .withColumn("rate", rate.cast("bigint"))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "source", "bucket", "rate")
    )


def _sample_mixture_sql() -> str:
    case = " ".join(
        f"WHEN '{lg}' THEN {r}" for lg, r in sorted(_MIX_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source, {_sql_h('text')} % 100 AS bucket,
       CAST(CASE lang {case} ELSE {_MIX_DEFAULT} END AS BIGINT) AS rate
FROM documents
WHERE {_sql_h('text')} % 100 < CASE lang {case} ELSE {_MIX_DEFAULT} END
"""


# ------------------------------------------------------- train/test split
# Deterministic hash-based train/test split (90/10 by content hash, so the
# assignment is stable under re-partitioning, re-ordering, and re-runs —
# the property a 100 TB pipeline needs to reproduce a split without ever
# materializing an assignment table). Per (lang, split): doc count, total
# chars, and an order-invariant bit_xor checksum of the doc hashes that
# downstream jobs can use to assert they read the identical split.

_SPLIT_MOD = 10  # hash % 10 < 9 -> train (90%), else test


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    d = docs.withColumn("h", _h(F.col("text"))).withColumn(
        "split",
        F.when(F.pmod(F.col("h"), F.lit(_SPLIT_MOD)) < _SPLIT_MOD - 1, "train")
        .otherwise("test"),
    )
    return d.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("bit_xor(h)").alias("checksum"),
    )


_SPLIT_SQL = f"""
WITH d AS (
  SELECT lang, n_chars, {_sql_h('text')} AS h,
         CASE WHEN {_sql_h('text')} % {_SPLIT_MOD} < {_SPLIT_MOD - 1}
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       bit_xor(h) AS checksum
FROM d GROUP BY lang, split
"""


# ----------------------------------------------------- curation pipeline
# The composed curation pass a training pipeline actually ships: exact
# dedup (keep min doc_id per content hash) -> quality gate (the
# q_doc_quality score) -> deterministic hash split -> per-(lang, split)
# audit with checksum. One window for dedup, narrow maps for score and
# split, one final aggregate: 2 shuffles end-to-end no matter the corpus
# size, and every stage is the already-attested operator.

_CUR_MIN_SCORE = 2.0


def q_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    sw = ",".join(f"'{w}'" for w in _STOPWORDS)
    w = Window.partitionBy("m").orderBy("doc_id")
    kept = (
        docs.withColumn("m", F.md5("text"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    scored = (
        kept.withColumn("toks", _TOKENS())
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
            "quality_score",
            (F.col("n_stop").cast("double") / F.col("n_tokens")) * 2.0
            + (1.0 - F.col("n_punct").cast("double") / F.col("n_chars"))
            + F.when(
                (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 1.0
            ).otherwise(0.0),
        )
        .filter(F.col("quality_score") >= _CUR_MIN_SCORE)
    )
    d = scored.withColumn("h", _h(F.col("text"))).withColumn(
        "split",
        F.when(F.pmod(F.col("h"), F.lit(_SPLIT_MOD)) < _SPLIT_MOD - 1, "train")
        .otherwise("test"),
    )
    return d.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("bit_xor(h)").alias("checksum"),
    )


_CURATION_SQL = f"""
WITH kept AS (
  SELECT * FROM documents
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
feat AS (
  SELECT lang, n_chars, text,
         CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({SQL_TOKENS},
              t -> t IN ({",".join(f"'{w}'" for w in _STOPWORDS)}))) AS BIGINT) AS n_stop,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM kept
),
scored AS (
  SELECT lang, n_chars, text,
         CAST(n_stop AS DOUBLE) / n_tokens * 2.0
           + (1.0 - CAST(n_punct AS DOUBLE) / n_chars)
           + CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
           AS quality_score
  FROM feat WHERE n_tokens > 0
),
d AS (
  SELECT lang, n_chars, {_sql_h('text')} AS h,
         CASE WHEN {_sql_h('text')} % {_SPLIT_MOD} < {_SPLIT_MOD - 1}
              THEN 'train' ELSE 'test' END AS split
  FROM scored WHERE quality_score >= {_CUR_MIN_SCORE}
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       bit_xor(h) AS checksum
FROM d GROUP BY lang, split
"""


# ------------------------------------------------ jackknife error bars
# Delete-one-group jackknife over sources: leave-one-source-out means of
# the corpus quality score, and the jackknife standard error
# SE = sqrt((g−1)/g · Σ(m_s − m̄)²) — the error bar a curation report
# should put next to "corpus quality improved by 0.3%" before anyone
# acts on it (sources are the natural correlated-sampling unit, so
# doc-level CLT SEs are too small). Per-doc scores are quantized to a
# 2^20 integer grid (domain_reweight's trick), so every corpus/source
# sum is exact BIGINT and each leave-out mean is one IEEE division; the
# two cross-source reductions are order-pinned folds over |sources|
# values.
#
# Scale: one narrow scoring pass + a |sources|-row aggregate; the fold
# reductions are constant-size. Output = |sources| rows.

_JK_Q = 1 << 20


def q_doc_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import ofold_sum

    scored = _qscored(_docs_par(spark, sf_dir)).withColumn(
        "q20", F.floor(F.col("qscore") * _JK_Q).cast("bigint")
    )
    # persists (round 11, scan census): per feeds tot AND loo; loo
    # feeds mbar, dev AND the output — unpersisted, the corpus scoring
    # pipeline evaluated 6x in one plan (both frames are |sources| rows)
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("q20").cast("bigint").alias("s20"),
    ).transform(_tp)
    tot = per.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("n_docs").cast("bigint").alias("n_tot"),
        F.sum("s20").cast("bigint").alias("s_tot"),
    )
    loo = per.join(tot).withColumn(
        "loo_mean",
        F.expr(f"CAST(s_tot - s20 AS DOUBLE) / ((n_tot - n_docs) * {_JK_Q})"),
    ).transform(_tp)
    mbar = loo.agg(
        (ofold_sum("source", "loo_mean") / F.max("g")).alias("mbar")
    )
    dev = loo.join(mbar).withColumn(
        "dsq", F.expr("(loo_mean - mbar) * (loo_mean - mbar)")
    )
    se = dev.agg(
        F.sqrt(
            F.expr("CAST(max(g) - 1 AS DOUBLE) / max(g)")
            * ofold_sum("source", "dsq")
        ).alias("jack_se")
    )
    return (
        loo.join(se)
        .select(
            "source", "n_docs", "loo_mean",
            F.expr(f"CAST(s_tot AS DOUBLE) / (n_tot * {_JK_Q})")
            .alias("corpus_mean"),
            "jack_se",
        )
    )


def _jackknife_sql() -> str:
    from ._util import sql_ofold_sum

    return f"""
WITH scored AS (
  SELECT source, CAST(FLOOR(qscore * {_JK_Q}) AS BIGINT) AS q20
  FROM ({_qscored_sql()}) s
),
per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(q20) AS BIGINT) AS s20
  FROM scored GROUP BY source
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g,
         CAST(SUM(n_docs) AS BIGINT) AS n_tot,
         CAST(SUM(s20) AS BIGINT) AS s_tot
  FROM per
),
loo AS (
  SELECT source, n_docs, s20, g, n_tot, s_tot,
         CAST(s_tot - s20 AS DOUBLE) / ((n_tot - n_docs) * {_JK_Q})
           AS loo_mean
  FROM per CROSS JOIN tot
),
mbar AS (
  SELECT {sql_ofold_sum('source', 'loo_mean')} / MAX(g) AS mbar FROM loo
),
dev AS (
  SELECT source, loo_mean, g,
         (loo_mean - mbar) * (loo_mean - mbar) AS dsq
  FROM loo CROSS JOIN mbar
),
se AS (
  SELECT sqrt(CAST(MAX(g) - 1 AS DOUBLE) / MAX(g)
              * {sql_ofold_sum('source', 'dsq')}) AS jack_se
  FROM dev
)
SELECT source, n_docs, loo_mean,
       CAST(s_tot AS DOUBLE) / (n_tot * {_JK_Q}) AS corpus_mean,
       jack_se
FROM loo CROSS JOIN se
"""


# --------------------------------------------- source vocabulary overlap
# Corpus-comparison for mixture design: pairwise bigram-vocabulary
# Jaccard between sources — "how much does src_i's phrasing overlap
# src_j's?" (token unigrams are degenerate on a closed vocabulary;
# bigram SETS separate sources). Exact integers, one final division.
#
# Scale: the (source, bigram) set shuffles distinct bigrams only; the
# shared-count self-join fans out ≤ |sources|² per bigram — with many
# sources the hot-bigram cap of q_doc_ngram_jaccard (_DF_CAP anti-join)
# is the drop-in mitigation. Output ≤ C(|sources|, 2) rows.


def q_doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    bg = (
        docs.withColumn("toks", _TOKENS())
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1]))"
                )
            ).alias("bigram"),
        )
        .distinct()
        .transform(_tp)  # feeds both the sizes aggregate and the self-join
    )
    sizes = bg.groupBy("source").agg(F.count(F.lit(1)).alias("vsize"))
    # inverted-index pair generation: group each bigram's source set
    # (bounded by |sources|) and explode ordered combinations — emits
    # each co-occurring pair once (the self-join emitted both probe
    # directions' worth of work) and needs no join shuffle
    shared = (
        bg.groupBy("bigram")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (a, i) ->"
                    " transform(slice(ss, i + 2, size(ss)),"
                    " b -> struct(a AS source_a, b AS source_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.source_a", "p.source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    return (
        shared.join(
            sizes.select(
                F.col("source").alias("source_a"), F.col("vsize").alias("vocab_a")
            ),
            "source_a",
        )
        .join(
            sizes.select(
                F.col("source").alias("source_b"), F.col("vsize").alias("vocab_b")
            ),
            "source_b",
        )
        .select(
            "source_a", "source_b", "shared", "vocab_a", "vocab_b",
            (
                F.col("shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


_SOURCE_OVERLAP_SQL = f"""
WITH toks AS (SELECT source, doc_id, {SQL_TOKENS} AS w FROM documents),
bg AS (
  SELECT DISTINCT source, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, unnest(range(1, len(w))) t(i)
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vsize FROM bg GROUP BY 1),
shared AS (
  SELECT x.source AS source_a, y.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM bg x JOIN bg y
    ON x.bigram = y.bigram AND x.source < y.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared, a.vsize AS vocab_a, b.vsize AS vocab_b,
       CAST(shared AS DOUBLE) / (a.vsize + b.vsize - shared) AS jaccard
FROM shared
JOIN sizes a ON a.source = source_a
JOIN sizes b ON b.source = source_b
"""


# ------------------------------------------------------------- upsert/MERGE
# Incremental corpus maintenance: MERGE-INTO semantics (matched → update,
# not-matched → insert) expressed as one full-outer join on the key —
# the table-maintenance op an incremental ingest pipeline runs per batch.
# Base = docs with doc_id % 3 != 0; update batch = uppercased docs with
# doc_id % 2 == 0. Output = per-action counts + an order-invariant
# bit_xor content checksum, so the oracle pins every merged row's final
# text without emitting the corpus. Scale shape: one co-partitioned
# shuffle join on the key — exactly what Delta/Iceberg MERGE compiles to.


def q_doc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text", "n_chars")
    upd = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.upper("text").alias("u_text"),
        F.col("n_chars").alias("u_chars"),
    )
    m = base.join(upd, "doc_id", "full_outer").select(
        F.when(F.col("u_text").isNull(), F.lit("keep"))
        .when(F.col("text").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
        F.coalesce("u_text", "text").alias("ftext"),
        F.coalesce("u_chars", "n_chars").alias("fchars"),
    )
    return m.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("fchars").alias("total_chars"),
        F.expr(
            "bit_xor(CAST(conv(substring(md5(ftext), 1, 15), 16, 10) AS BIGINT))"
        ).alias("content_xor"),
    )


_UPSERT_SQL = f"""
WITH base AS (
  SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 3 <> 0
),
upd AS (
  SELECT doc_id, upper(text) AS u_text, n_chars AS u_chars
  FROM documents WHERE doc_id % 2 = 0
),
m AS (
  SELECT CASE WHEN u.u_text IS NULL THEN 'keep'
              WHEN b.text IS NULL THEN 'insert'
              ELSE 'update' END AS action,
         COALESCE(u.u_text, b.text) AS ftext,
         COALESCE(u.u_chars, b.n_chars) AS fchars
  FROM base b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id
)
SELECT action, COUNT(*) AS n_docs, CAST(SUM(fchars) AS BIGINT) AS total_chars,
       bit_xor({_sql_h('ftext')}) AS content_xor
FROM m GROUP BY action
"""

# ------------------------------------------------------------------- DSIR
# Data Selection via Importance Resampling (Xie et al. 2023): score every
# document by how much more likely its hashed n-gram features are under a
# target distribution than under the raw pool, then keep the top-scoring
# docs. Target here = the `en` slice (stand-in for "high-quality domain");
# features = md5-hashed unigrams in _DSIR_B buckets; the importance
# log-ratio is computed in EXACT fixed-point base-2 (4 fractional bits):
#   ilog2(x)  = length(bin(x)) - 1                      (exact, both engines)
#   qlog2(x)  = 16*ilog2(x) + (16x DIV 2^ilog2(x)) - 16 (piecewise-linear
#               log2, monotone, max err ~0.09 octave — integer-only, so
#               Spark and DuckDB agree bit-for-bit; no transcendentals)
#   w_f       = qlog2((tc+1)(R+B)) - qlog2((rc+1)(T+B)) ≈ 16·log2(p̂_f/q̂_f)
# where tc/rc = target/raw occurrences of bucket f, T/R their totals, +1/+B
# the add-one smoothing. doc score = Σ_f c_f·w_f (BIGINT throughout); the
# deterministic stand-in for DSIR's Gumbel-top-k is rank by (score, doc_id).
#
# Scale shape: ONE tokenize/explode pass → (doc_id, f) counts (the only
# corpus-sized shuffle, map-side combined); the weight table is ≤ _DSIR_B
# rows — re-aggregated from the doc counts (never a second corpus scan) and
# broadcast back; totals are a single-row broadcast. Counts fit BIGINT
# through ~10^15 tokens; beyond that widen the fixed-point to DECIMAL.

_DSIR_B = 4096
_DSIR_TARGET = "en"
_DSIR_TAKE = 100




def _dsir_weight_expr(dialect: str) -> str:
    """The importance-weight expression over columns tc, rc, t_total,
    r_total — the difference of two _qlog2_expr terms."""
    num = f"((tc + 1) * (r_total + {_DSIR_B}))"
    den = f"((rc + 1) * (t_total + {_DSIR_B}))"
    return f"({_qlog2_expr(num, dialect)} - {_qlog2_expr(den, dialect)})"


def q_doc_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    feats = docs.select(
        "doc_id", "lang", "source", F.explode(_TOKENS()).alias("tok")
    ).select("doc_id", "lang", "source", (_h(F.col("tok")) % _DSIR_B).alias("f"))
    # lang/source ride the group key (functionally dependent on doc_id),
    # saving a join back to `documents` for the output columns
    docf = feats.groupBy("doc_id", "lang", "source", "f").agg(
        F.count(F.lit(1)).alias("c")
    ).transform(_tp)
    fw = docf.groupBy("f").agg(
        F.sum(F.when(F.col("lang") == _DSIR_TARGET, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("tc"),
        F.sum("c").cast("bigint").alias("rc"),
    )
    tot = fw.agg(
        F.sum("tc").cast("bigint").alias("t_total"),
        F.sum("rc").cast("bigint").alias("r_total"),
    )
    w = (
        fw.join(F.broadcast(tot))  # single-row broadcast NLJ
        .withColumn("w", F.expr(_dsir_weight_expr("spark")).cast("bigint"))
        .select("f", "w")
    )
    scores = (
        docf.join(F.broadcast(w), "f")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("w")).cast("bigint").alias("dsir_score"),
        )
    )
    # deterministic top-k: TakeOrdered (per-partition top-k + merge), not a
    # global sort; ties broken by doc_id
    return scores.orderBy(F.col("dsir_score").desc(), "doc_id").limit(_DSIR_TAKE)


def _dsir_sql() -> str:
    return f"""
WITH feats AS (
  SELECT doc_id, lang, source, {_sql_h('tok')} % {_DSIR_B} AS f
  FROM (SELECT doc_id, lang, source, unnest({SQL_TOKENS}) AS tok
        FROM documents)
),
docf AS (
  SELECT doc_id, lang, source, f, COUNT(*) AS c
  FROM feats GROUP BY doc_id, lang, source, f
),
fw AS (
  SELECT f,
         CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET}' THEN c ELSE 0 END) AS BIGINT) AS tc,
         CAST(SUM(c) AS BIGINT) AS rc
  FROM docf GROUP BY f
),
tot AS (
  SELECT CAST(SUM(tc) AS BIGINT) AS t_total, CAST(SUM(rc) AS BIGINT) AS r_total
  FROM fw
),
w AS (
  SELECT f, CAST({_dsir_weight_expr('duckdb')} AS BIGINT) AS w
  FROM fw CROSS JOIN tot
),
scores AS (
  SELECT doc_id, lang, source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(c * w) AS BIGINT) AS dsir_score
  FROM docf JOIN w USING (f)
  GROUP BY doc_id, lang, source
)
SELECT * FROM scores ORDER BY dsir_score DESC, doc_id LIMIT {_DSIR_TAKE}
"""


# ---------------------------------------------------------------- Neyman
# Optimal stratified eval-set allocation (Neyman 1934): given a fixed
# labeling budget of _NEYMAN_N docs, allocate per-language sample sizes
# n_h ∝ N_h·σ_h (stratum size × stddev of doc length) — minimum-variance
# stratified sampling, the statistically-grounded upgrade of the uniform
# per-language quota in q_doc_sample_mixture. Then draw each stratum's
# quota deterministically by hash rank.
#
# Exact integer pipeline: the Neyman weight N_h·σ_h equals
# isqrt(N_h·Σx² − (Σx)²) — so ONE integer sqrt per stratum; isqrt uses
# floor(sqrt(double)) corrected by ±1 via exact integer square compares,
# making the two engines' last-ulp sqrt noise irrelevant. Fractional
# allocations round by the largest-remainder method (alloc = n·w DIV W,
# leftover seats by remainder rank, ties by lang) — integers end-to-end,
# no floats anywhere. The final quota is capped at the stratum size
# (single-pass truncation; surplus is NOT re-distributed — documented).
# BIGINT bounds: N_h·Σx² safe while N_h·Σ(n_chars²) < 2^63 (~10^9 docs
# of 10^5 chars); widen to DECIMAL(38,0) beyond.
#
# Scale shape: one narrow per-stratum moment aggregate (map-side
# combined), the allocation arithmetic on the |langs|-row table, and one
# PARTITION-PARALLEL per-stratum draw rank (grouped_row_number, round 7
# — a per-lang rank window would put each stratum in one task) — raw
# docs are scanned twice (moments, draw), shuffled once by the rank's
# range partitioner.

_NEYMAN_N = 100


def _isqrt_expr(v: str, dialect: str) -> str:
    """Exact floor(sqrt(v)) for BIGINT v ≥ 0 in both dialects: seed from
    the double sqrt, then correct ±1 with integer square comparisons so a
    1-ulp libm difference cannot split the engines."""
    s0 = f"CAST(floor(sqrt(CAST({v} AS DOUBLE))) AS BIGINT)"
    return (
        f"({s0} + (CASE WHEN ({s0} + 1) * ({s0} + 1) <= ({v}) THEN 1 ELSE 0 END)"
        f" - (CASE WHEN {s0} * {s0} > ({v}) THEN 1 ELSE 0 END))"
    )


def q_doc_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    stats = stats.withColumn(
        "v", F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).withColumn("w", F.expr(_isqrt_expr("v", "spark")).cast("bigint"))
    wtot = Window.partitionBy()
    alloc = (
        stats.withColumn("w_total", F.sum("w").over(wtot))
        .withColumn(
            "alloc0",
            F.expr(f"CAST(({_NEYMAN_N} * w) DIV w_total AS BIGINT)"),
        )
        .withColumn("rem", F.expr(f"({_NEYMAN_N} * w) % w_total"))
        .withColumn("leftover", F.lit(_NEYMAN_N) - F.sum("alloc0").over(wtot))
        .withColumn(
            "rr",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.col("rem").desc(), F.col("lang")
                )
            ),
        )
        .withColumn(
            "alloc",
            F.col("alloc0")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0),
        )
        .withColumn("quota", F.least(F.col("alloc"), F.col("n_docs")))
    )
    # per-lang hash-ordered draw rank, partition-parallel (round 7 —
    # the q_ev_mad_outliers grouped_row_number shape; a partitionBy(lang)
    # window would funnel each stratum through one task)
    from ..catalog import table_rows
    from ..core.spark_engine import grouped_row_number

    ranked = grouped_row_number(
        spark,
        docs.withColumn("_hk", _h(F.col("doc_id").cast("string"))),
        ["lang"],
        ["_hk", "doc_id"],
        "rk",
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).drop("_hk")
    sampled = (
        ranked.join(
            F.broadcast(alloc.select("lang", "quota")), "lang", "inner"
        )
        .filter(F.col("rk") <= F.col("quota"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_taken"),
            F.expr("bit_xor(doc_id)").cast("bigint").alias("sample_xor"),
            F.sum("n_chars").cast("bigint").alias("sample_chars"),
        )
    )
    return (
        alloc.select("lang", "n_docs", "w", "alloc", "quota")
        .join(sampled, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.col("w").alias("neyman_w"),
            "alloc",
            "quota",
            F.coalesce("n_taken", F.lit(0)).cast("bigint").alias("n_taken"),
            F.coalesce("sample_xor", F.lit(0)).cast("bigint").alias("sample_xor"),
            F.coalesce("sample_chars", F.lit(0)).cast("bigint").alias(
                "sample_chars"
            ),
        )
    )


def _neyman_sql() -> str:
    isq = _isqrt_expr("v", "duckdb")
    return f"""
WITH stats AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY lang
),
wv AS (
  SELECT lang, n_docs, n_docs * sxx - sx * sx AS v FROM stats
),
ww AS (
  SELECT lang, n_docs, CAST({isq} AS BIGINT) AS w FROM wv
),
alloc AS (
  SELECT lang, n_docs, w,
         CAST(({_NEYMAN_N} * w) // SUM(w) OVER () AS BIGINT) AS alloc0,
         ({_NEYMAN_N} * w) % SUM(w) OVER () AS rem
  FROM ww
),
lr AS (
  SELECT lang, n_docs, w, alloc0, rem,
         {_NEYMAN_N} - SUM(alloc0) OVER () AS leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr
  FROM alloc
),
fin AS (
  SELECT lang, n_docs, w,
         alloc0 + (CASE WHEN rr <= leftover THEN 1 ELSE 0 END) AS alloc,
         LEAST(alloc0 + (CASE WHEN rr <= leftover THEN 1 ELSE 0 END),
               n_docs) AS quota
  FROM lr
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_sql_h('CAST(doc_id AS VARCHAR)')}, doc_id) AS rk
  FROM documents
),
sampled AS (
  SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS n_taken,
         CAST(bit_xor(r.doc_id) AS BIGINT) AS sample_xor,
         CAST(SUM(r.n_chars) AS BIGINT) AS sample_chars
  FROM ranked r JOIN fin f ON r.lang = f.lang
  WHERE r.rk <= f.quota
  GROUP BY r.lang
)
SELECT f.lang, f.n_docs, f.w AS neyman_w,
       CAST(f.alloc AS BIGINT) AS alloc, CAST(f.quota AS BIGINT) AS quota,
       COALESCE(s.n_taken, 0) AS n_taken,
       COALESCE(s.sample_xor, 0) AS sample_xor,
       COALESCE(s.sample_chars, 0) AS sample_chars
FROM fin f LEFT JOIN sampled s ON f.lang = s.lang
"""


# ------------------------------------------------- weighted sampling (A-ES)
# Weighted sampling WITHOUT replacement by the Efraimidis-Spirakis
# exponential race (A-ES, IPL 2006): each doc draws a deterministic
# pseudo-uniform u ∈ (0,1] from its id hash and keeps key u^(1/w)
# (w = n_chars); the global top-K keys ARE a weight-proportional
# without-replacement sample. Maximizing u^(1/w) ⟺ minimizing
# (−log2 u)/w, computed exactly as the INTEGER fixed-point
# qlog2(M) − qlog2(u_int) divided once by the integer weight (single
# IEEE division, engine-identical). Scale shape: narrow scan + a
# distributed top-K (TakeOrderedAndProject — no global sort, no shuffle
# of the corpus); the canonical one-pass distributed weighted sampler.

_WS_M = 1 << 20
_WS_K = 100


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir).filter(F.col("n_chars") > 0)
    scored = docs.select(
        "doc_id",
        "n_chars",
        (
            _h(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
            % F.lit(_WS_M)
            + 1
        ).alias("u_int"),
    ).select(
        "doc_id",
        "n_chars",
        "u_int",
        F.expr(
            f"CAST(({_qlog2_expr(str(_WS_M), 'spark')}"
            f" - {_qlog2_expr('u_int', 'spark')}) AS BIGINT)"
        ).alias("nlog_q"),
    ).select(
        "doc_id",
        "n_chars",
        "u_int",
        "nlog_q",
        (F.col("nlog_q").cast("double") / F.col("n_chars").cast("double"))
        .alias("race_key"),
    )
    top = scored.orderBy("race_key", "doc_id").limit(_WS_K)
    w = Window.orderBy("race_key", "doc_id")
    return top.withColumn(
        "sample_rank", F.row_number().over(w).cast("bigint")
    ).select(
        "sample_rank", "doc_id", "n_chars", "u_int", "nlog_q", "race_key"
    )


def _weighted_sample_sql() -> str:
    qm = _qlog2_expr(str(_WS_M), "duckdb")
    qu = _qlog2_expr("u_int", "duckdb")
    return f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         {_sql_h("'ws:' || CAST(doc_id AS VARCHAR)")} % {_WS_M} + 1 AS u_int
  FROM documents WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, n_chars, u_int,
         CAST(({qm} - {qu}) AS BIGINT) AS nlog_q
  FROM scored
),
raced AS (
  SELECT *, CAST(nlog_q AS DOUBLE) / CAST(n_chars AS DOUBLE) AS race_key
  FROM keyed
),
top AS (
  SELECT * FROM raced ORDER BY race_key, doc_id LIMIT {_WS_K}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY race_key, doc_id) AS BIGINT)
         AS sample_rank,
       doc_id, n_chars, u_int, nlog_q, race_key
FROM top
"""




# ------------------------------------------------------- host/source caps
# C4/RefinedWeb-style HOST CAP applied per `source` (the corpus's
# host/domain analog): each source contributes at most _HOST_CAP
# documents, admission ranked by the fixed-point quality score (q20 =
# floor(qscore * 2^20), the jackknife convention — BIGINT ranks are
# cross-engine exact) with doc_id as the deterministic tiebreak. Where
# q_doc_domain_reweight computes target WEIGHTS, this applies the hard
# CAP and reports the realized yield: kept/dropped docs, token yield,
# and the admission threshold (the lowest kept q20) per source.
#
# Scale shape: ranking goes through topk_per_group (two-phase: local
# top-k per (source, partition), exact rank over the bounded survivor
# set) — no source's whole corpus slice ever funnels through one task.
# NULL sources fold onto '' (COALESCE convention, CLAUDE.md) so the
# group survives the join in both engines.

_HOST_CAP = 20
_HC_Q = 1 << 20


def q_doc_host_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import topk_per_group

    scored = (
        _qscored(_docs_par(spark, sf_dir))
        .select(
            F.coalesce("source", F.lit("")).alias("src"),
            "doc_id",
            "n_tokens",
            F.floor(F.col("qscore") * _HC_Q).cast("bigint").alias("q20"),
        )
        .transform(_tp)
    )
    tot = scored.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )
    kept = topk_per_group(
        scored,
        ["src"],
        [F.col("q20").desc(), F.col("doc_id").asc()],
        _HOST_CAP,
    )
    ka = kept.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        F.min("q20").alias("cut_q20"),
    )
    return tot.join(ka, "src").select(
        F.col("src").alias("source"),
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
        "tokens_total",
        "tokens_kept",
        (F.col("n_kept").cast("double") / F.col("n_docs")).alias("kept_frac"),
        "cut_q20",
    )


def _host_caps_sql() -> str:
    return f"""
WITH scored AS (
  SELECT COALESCE(source, '') AS src, doc_id, n_tokens,
         CAST(FLOOR(qscore * {_HC_Q}) AS BIGINT) AS q20
  FROM ({_qscored_sql()}) s
),
tot AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
  FROM scored GROUP BY src
),
rk AS (
  SELECT src, q20, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY q20 DESC, doc_id)
           AS rn
  FROM scored
),
ka AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
         MIN(q20) AS cut_q20
  FROM rk WHERE rn <= {_HOST_CAP} GROUP BY src
)
SELECT t.src AS source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
       tokens_total, tokens_kept,
       CAST(n_kept AS DOUBLE) / n_docs AS kept_frac, cut_q20
FROM tot t JOIN ka USING (src)
"""


_HOST_CAPS_SQL = _host_caps_sql()


# ------------------------------------------------- training-order shuffle
# Deterministic EPOCH SHUFFLE: the manifest a training data-loader
# consumes — every doc assigned a shard (hash mod _SHUF_SHARDS, salted
# so the permutation is independent of the other md5-keyed operators)
# and a within-shard position by (hash, doc_id). Reproducible across
# runs and engines (md5-derived 60-bit integer hash, the
# documents_shared convention), yet uncorrelated with doc_id order — the
# property a global ORDER BY rand() cannot give you.
#
# Scale shape: the hash and shard are narrow maps; the within-shard
# position goes through grouped_row_number (size-gated: one small window
# at or below TWO_PHASE_MIN_ROWS, the two-phase checkpoint plan above) —
# no shard's slice ever funnels through one task at corpus scale. Shards
# are hash-balanced, but that is a probabilistic bound, not a provable
# one, so max_group_rows stays unset (CLAUDE.md rule).

_SHUF_SHARDS = 8


def _shard_balance_bound(n_rows: int, shards: int = _SHUF_SHARDS) -> int:
    """Provable upper bound on the LARGEST hash-shard's size (VERDICT r8
    #3). Under the random-oracle model of the md5-derived hash, shard
    sizes are Binomial(n, 1/shards); the multiplicative Chernoff bound
    gives P(any shard > (1+d)·n/shards) ≤ shards·exp(−d²·n/(3·shards)).
    Solving for failure probability 1e-9:
        d = sqrt(3·shards·ln(shards/1e-9) / n)
    (≈ 0.8% at n = 8M, shards = 8). The bound gates only the PLAN —
    grouped_row_number's local window is correct at any size, it is just
    single-task-per-group — so the 1e-9 tail risks one slow task, never
    a wrong answer. Exceeding TWO_PHASE_MIN_ROWS flips back to the
    two-phase distributed rank automatically."""
    import math

    if n_rows <= 0:
        return 1
    d = math.sqrt(3 * shards * math.log(shards / 1e-9) / n_rows)
    return math.ceil(n_rows / shards * (1.0 + d))


def q_doc_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table_rows
    from ..core.spark_engine import grouped_row_number

    hashed = _docs_par(spark, sf_dir).select(
        "doc_id",
        _h(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string"))).alias("h"),
    ).withColumn("shard", F.col("h") % _SHUF_SHARDS)
    n_docs = table_rows(spark, sf_dir, "documents")
    return grouped_row_number(
        spark,
        hashed,
        ["shard"],
        ["h", "doc_id"],
        "pos",
        n_rows=n_docs,
        # balanced-by-construction: the largest mod-8 hash shard is
        # Chernoff-bounded near n/8, so the cheap per-group window stays
        # valid to ~8x the global row threshold (derivation above)
        max_group_rows=_shard_balance_bound(n_docs),
    ).select("doc_id", "shard", "pos", "h")


_SHUFFLE_SHARDS_SQL = f"""
WITH h AS (
  SELECT doc_id,
         {_sql_h("'shuf|' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id, h % {_SHUF_SHARDS} AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_SHUF_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos,
       h
FROM h
"""
