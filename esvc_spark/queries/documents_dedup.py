"""Deduplication family over the `documents` table: exact/content
hashing, shingled MinHash+LSH (+ b-bit, + fidelity audits), SimHash,
winnowing, n-gram Jaccard/containment, duplicate clustering and its
downstream audits (agreement, tuning, method eval, transitivity,
cross-source, spans, runs), canonical selection, contamination, novelty.

Split from the original single documents module (round 6) — see
`documents.py` for the registry; shared hashing/tokenising primitives
live in `documents_shared.py`. Cross-engine determinism rules are
documented there and in CLAUDE.md.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import sql_dsum, tracked_persist as _tp
from .documents_shared import _P, _h, _sql_h, _TOKENS, SQL_TOKENS, _docs_par, _STOPWORDS

# ------------------------------------------------------------- exact dedup
# Exact duplicate detection by content hash: the canonical first dedup
# pass of any training-data pipeline. Representative = min doc_id.


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("rep_doc"),
            F.count(F.lit(1)).alias("n_copies"),
            F.max("n_chars").alias("n_chars"),
        )
    )


_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS rep_doc, COUNT(*) AS n_copies,
       MAX(n_chars) AS n_chars
FROM documents GROUP BY md5(text)
"""

# ------------------------------------------------------------- fingerprint
# Rolling polynomial hash (Karp-Rabin style) over the character stream:
# acc = (acc*31 + codepoint) mod 1e9+7 — a content fingerprint that is
# pure integer arithmetic, identical in any engine.


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    fp = F.expr(
        "aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {_P})"
    )
    return docs.select(
        "doc_id",
        F.when(F.length("text") == 0, F.lit(0)).otherwise(fp).alias("fingerprint"),
        F.length("text").cast("bigint").alias("text_len"),
    )


_FINGERPRINT_SQL = f"""
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 0
            ELSE list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % {_P})
       END AS fingerprint,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""

# ------------------------------------------------------- n-gram jaccard
# Exact near-dup pairs by 5-token-shingle Jaccard >= 0.5: shingle →
# inverted-index self-join → integer overlap counts. The all-pairs blowup
# is bounded by shingle selectivity; for skewed shingles the LSH variant
# below is the scale path.

_SHINGLE = 5


def _shingles_df(docs: DataFrame, dedup: bool = True) -> DataFrame:
    """Per-doc shingle table. ``dedup=False`` skips the per-doc distinct
    for consumers whose downstream math is duplicate-insensitive (the
    MinHash signature: MIN over a multiset = MIN over its set — round
    11); every set-semantics consumer (Jaccard counts, df caps,
    containment) keeps the default distinct."""
    sh = F.expr(
        f"CASE WHEN size(w) >= {_SHINGLE} THEN "
        f"transform(sequence(0, size(w) - {_SHINGLE}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {_SHINGLE}))) "
        "ELSE array() END"
    )
    out = (
        docs.select("doc_id", _TOKENS().alias("w"))
        .select("doc_id", F.explode(sh).alias("shingle"))
    )
    return out.distinct() if dedup else out


_SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id,
         array_to_string(w[i:i+{_SHINGLE - 1}], ' ') AS shingle
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) - {_SHINGLE - 2})) t(i)
"""


# Shingles with document frequency above this cap (boilerplate) are
# dropped before the self-join: one hot shingle key otherwise explodes
# quadratically (df^2 pairs) — the classic skew failure of inverted-index
# near-dup at corpus scale. Boilerplate shingles carry no similarity
# signal, so capping changes semantics only for junk keys. Jaccard is then
# computed over the capped shingle sets on both engines.
_DF_CAP = 100


class _Shingles(NamedTuple):
    """Return type of _capped_shingles (ADVICE r11: the old
    DataFrame-or-tuple return depending on with_all invited unpacking
    bugs). `capped` is the df-capped table; `uncapped` the persisted
    full table it was derived from."""

    capped: DataFrame
    uncapped: DataFrame


def _capped_shingles(docs: DataFrame) -> _Shingles:
    """The df-capped shingle table (plus its persisted uncapped source).
    The hot-shingle list (df > cap) is tiny by construction — boilerplate
    keys only — so it broadcasts, and the cap costs one map-side-combined
    aggregate plus a broadcast anti-join: no extra shuffle of the full
    shingle table. Persists uncapped (feeds the df aggregate + anti-join;
    a caller needing both — lsh_tuning's MinHash side — reuses this pass
    instead of re-running the tokenize+shingle pipeline, round 11) and
    capped (every caller fans it into multiple branches). Shared by
    ngram_jaccard / containment / lsh_tuning so the cap semantics cannot
    drift between the dedup queries and the audits of them."""
    all_sh = _shingles_df(docs).transform(_tp)
    hot = (
        all_sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _DF_CAP)
        .select("shingle")
    )
    sh = all_sh.join(F.broadcast(hot), "shingle", "left_anti").transform(_tp)
    return _Shingles(capped=sh, uncapped=all_sh)


def _ngram_jaccard_scored(sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared, jaccard >= 0.5) from an existing capped
    shingle frame — factored out (round 12) so q_dedup_method_eval's
    truth side reuses ONE tokenize+shingle pass with the MinHash arm."""
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    return _ngram_jaccard_scored(_capped_shingles(docs).capped)


_NGRAM_JACCARD_SQL = f"""
WITH all_sh AS ({_SQL_SHINGLES}),
sh AS (
  SELECT doc_id, shingle FROM all_sh
  WHERE shingle IN (SELECT shingle FROM all_sh
                    GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP})
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared) AS jaccard
FROM pairs
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared) >= 0.5
"""

# ------------------------------------------------------- minhash + LSH
# MinHash signatures (16 permutations) over 5-token shingles, banded 4×4
# for candidate generation: the scale path for near-dedup — candidate
# pairs come from equality joins on band keys (shuffle on band hash), and
# similarity is estimated from signature agreement. All integer math.

_N_PERM = 16
_N_BANDS = 4
_ROWS_PER_BAND = _N_PERM // _N_BANDS
# deterministic permutation parameters (LCG-derived, pinned literals)
_PERMS = [((1103515245 * i + 12345) % _P or 1, (69069 * i + 1) % _P) for i in range(1, _N_PERM + 1)]


def _sig_from_shingles(sh: DataFrame) -> DataFrame:
    """MinHash signature table (doc_id, mh0..mh15) from an existing
    distinct-shingle frame — callers that already hold (or persist) the
    shingle table reuse it instead of re-running tokenize+shingle."""
    hashed = sh.select("doc_id", (_h(F.col("shingle")) % _P).alias("h"))
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"mh{i}")
            for i, (a, b) in enumerate(_PERMS)
        ]
    )


def _mh_sig(docs: DataFrame) -> DataFrame:
    """MinHash signature table (doc_id, mh0..mh15) for any (doc_id, text)
    frame — shared by the self-join LSH and the incremental variant.
    Shingles are NOT deduplicated first: MIN over the hashed multiset
    equals MIN over the set, so the signature is bit-identical and the
    per-doc distinct pass is pure cost here (round 11)."""
    return _sig_from_shingles(_shingles_df(docs, dedup=False))


def _mh_bands(sig: DataFrame) -> DataFrame:
    """Banded LSH keys (doc_id, band_idx, band_key) from a signature table."""
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"mh{j}")
                            for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
                        ],
                    )
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band_idx", "band_key"),
    )


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    # persist: the signature table feeds four plan branches (2 band sides,
    # 2 re-rank sides); without it the shingle+md5 pipeline re-runs per branch
    return _minhash_lsh_scored(_mh_sig(docs).transform(_tp))


def _minhash_lsh_scored(sig: DataFrame) -> DataFrame:
    """The banded-LSH candidate + signature re-rank pipeline from an
    existing (persisted) signature table — factored out (round 12) so
    q_dedup_method_eval feeds it signatures built from the SAME shingle
    pass as its exact-Jaccard truth side (signatures are identical
    either way: MIN over the hashed set = MIN over the multiset)."""
    bands = _mh_bands(sig)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(_N_PERM)
    )
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("sig_matches", matches.cast("bigint"))
        .withColumn("est_jaccard", F.col("sig_matches").cast("double") / float(_N_PERM))
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "sig_matches", "est_jaccard")
    )


def _mh_sql_fragments() -> tuple[str, str, str]:
    """(mins, band_keys, band_rows) SQL fragments of the MinHash banding
    — single source for _minhash_sql and the _lsh_tuning_sql audit so
    the audited index can never drift from the dedup index."""
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(_PERMS)
    )
    band_keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"mh{j}" for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
        + f") AS band{b}"
        for b in range(_N_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM banded"
        for b in range(_N_BANDS)
    )
    return mins, band_keys, band_rows


def _minhash_sql() -> str:
    mins, band_keys, band_rows = _mh_sql_fragments()
    match_expr = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_N_PERM)
    )
    return f"""
WITH sh AS ({_SQL_SHINGLES}),
hashed AS (SELECT doc_id, {_sql_h('shingle')} % {_P} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_keys} FROM sig),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST({match_expr} AS BIGINT) AS sig_matches,
       CAST({match_expr} AS DOUBLE) / {_N_PERM} AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
WHERE CAST({match_expr} AS DOUBLE) / {_N_PERM} >= 0.5
"""


# ------------------------------------------- incremental (batch) dedup
# Dedup a NEW BATCH against an EXISTING CORPUS without ever self-joining
# the corpus — the shape of streaming ingest dedup at 100 TB: the batch
# (doc_id < _INC_BATCH stands in for today's arrivals) is tiny and
# broadcast everywhere; the corpus is streamed exactly twice (once for
# exact md5 matches, once for LSH band probes) and never shuffled against
# itself. Verdict per batch doc: 'exact' (corpus copy exists), 'near'
# (MinHash est_jaccard >= 0.5 with some corpus doc), else 'unique'.

_INC_BATCH = 100


def q_doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") < _INC_BATCH)
    corpus = docs.filter(F.col("doc_id") >= _INC_BATCH)

    # exact: stream the corpus md5s against the broadcast batch
    bm = batch.select(F.col("doc_id").alias("b_doc"), F.md5("text").alias("m"))
    n_exact = (
        corpus.select(F.md5("text").alias("m"))
        .join(F.broadcast(bm), "m")
        .groupBy("b_doc")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )

    # near: corpus band keys probed by the broadcast batch bands; the
    # candidate list is LSH-bounded (batch-sized x bucket collisions), so
    # it broadcasts into the corpus-signature re-rank join too — the big
    # signature table is streamed, never shuffled.
    sig_b = _mh_sig(batch).transform(_tp)
    sig_c = _mh_sig(corpus)
    cand = (
        _mh_bands(sig_c)
        .join(
            F.broadcast(
                _mh_bands(sig_b).select(
                    F.col("doc_id").alias("b_doc"), "band_idx", "band_key"
                )
            ),
            ["band_idx", "band_key"],
        )
        .select("b_doc", F.col("doc_id").alias("c_doc"))
        .distinct()
    )
    cand_sig = cand.join(
        F.broadcast(sig_b.select(F.col("doc_id").alias("b_doc"), *[f"mh{i}" for i in range(_N_PERM)])),
        "b_doc",
    )
    matches = sum(
        F.when(F.col(f"mh{i}") == F.col(f"cmh{i}"), 1).otherwise(0)
        for i in range(_N_PERM)
    )
    n_near = (
        F.broadcast(cand_sig)
        .join(
            sig_c.select(
                F.col("doc_id").alias("c_doc"),
                *[F.col(f"mh{i}").alias(f"cmh{i}") for i in range(_N_PERM)],
            ),
            "c_doc",
        )
        .withColumn("est", matches.cast("double") / float(_N_PERM))
        .filter(F.col("est") >= 0.5)
        .groupBy("b_doc")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )

    base = batch.select(F.col("doc_id").alias("b_doc"))
    # both aggregates are batch-bounded: broadcast, never sort-merge
    return (
        base.join(F.broadcast(n_exact), "b_doc", "left")
        .join(F.broadcast(n_near), "b_doc", "left")
        .select(
            F.col("b_doc").alias("doc_id"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_near", F.lit(0)).alias("n_near"),
            F.when(F.coalesce("n_exact", F.lit(0)) > 0, "exact")
            .when(F.coalesce("n_near", F.lit(0)) > 0, "near")
            .otherwise("unique")
            .alias("verdict"),
        )
    )


def _incremental_sql() -> str:
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(_PERMS)
    )
    band_keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"mh{j}" for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
        + f") AS band{b}"
        for b in range(_N_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM banded"
        for b in range(_N_BANDS)
    )
    match_expr = " + ".join(
        f"CASE WHEN sb.mh{i} = sc.mh{i} THEN 1 ELSE 0 END" for i in range(_N_PERM)
    )
    return f"""
WITH sh AS ({_SQL_SHINGLES}),
hashed AS (SELECT doc_id, {_sql_h('shingle')} % {_P} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_keys} FROM sig),
bands AS ({band_rows}),
n_exact AS (
  SELECT b.doc_id AS b_doc, COUNT(*) AS n_exact
  FROM (SELECT doc_id, md5(text) AS m FROM documents
        WHERE doc_id < {_INC_BATCH}) b
  JOIN (SELECT md5(text) AS m FROM documents
        WHERE doc_id >= {_INC_BATCH}) c USING (m)
  GROUP BY b.doc_id
),
cand AS (
  SELECT DISTINCT b.doc_id AS b_doc, c.doc_id AS c_doc
  FROM bands b JOIN bands c
    ON b.band_idx = c.band_idx AND b.band_key = c.band_key
  WHERE b.doc_id < {_INC_BATCH} AND c.doc_id >= {_INC_BATCH}
),
n_near AS (
  SELECT b_doc, COUNT(*) AS n_near
  FROM cand
  JOIN sig sb ON sb.doc_id = b_doc
  JOIN sig sc ON sc.doc_id = c_doc
  WHERE CAST({match_expr} AS DOUBLE) / {_N_PERM} >= 0.5
  GROUP BY b_doc
)
SELECT d.doc_id, COALESCE(n_exact, 0) AS n_exact, COALESCE(n_near, 0) AS n_near,
       CASE WHEN COALESCE(n_exact, 0) > 0 THEN 'exact'
            WHEN COALESCE(n_near, 0) > 0 THEN 'near'
            ELSE 'unique' END AS verdict
FROM (SELECT doc_id FROM documents WHERE doc_id < {_INC_BATCH}) d
LEFT JOIN n_exact ON n_exact.b_doc = d.doc_id
LEFT JOIN n_near ON n_near.b_doc = d.doc_id
"""


# ----------------------------------------------------------- winnowing
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
# algorithm): hash every 4-token k-gram, slide a 5-position window, keep
# each window's MINIMUM hash; the distinct minima are the document's
# fingerprint set. Guarantee: any shared run of ≥ w+k-1 tokens shares a
# fingerprint, while the inverted index is ~w× smaller than full
# shingling — the storage/shuffle win that makes exact-ish matching
# practical at corpus scale. Pairs sharing ≥ 2 fingerprints are reported
# with a Jaccard over the (df-capped) fingerprint sets, same hot-key
# anti-join policy as the shingle queries.

_WIN_K = 4
_WIN_W = 5
_WIN_MIN_SHARED = 2


def q_doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    # Array-native winnowing (round 11): k-gram hashes and the W-wide
    # sliding minima are computed inside the token array — no posexplode
    # of every k-gram, no doc-window sort (guide §2.4). Bit-identical to
    # the previous window shape: for each full window ending at position
    # p ≥ W-1, min(h[p-W+1..p]) — exactly array_min(slice(hs, i+1, W))
    # at i = p-W+1 — then the per-doc distinct set, via array_distinct.
    hs = F.expr(
        f"CASE WHEN size(w) >= {_WIN_K} THEN "
        f"transform(sequence(0, size(w) - {_WIN_K}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', "
        f"slice(w, i + 1, {_WIN_K}))), 1, 15), 16, 10) as bigint)) "
        "ELSE array() END"
    )
    mins = F.expr(
        f"CASE WHEN size(hs) >= {_WIN_W} THEN "
        f"array_distinct(transform(sequence(0, size(hs) - {_WIN_W}), "
        f"i -> array_min(slice(hs, i + 1, {_WIN_W})))) "
        "ELSE array() END"
    )
    fps = (
        docs.select("doc_id", _TOKENS().alias("w"))
        .select("doc_id", hs.alias("hs"))
        .select("doc_id", F.explode(mins).alias("mn"))
    )
    # hot-fingerprint cap: one boilerplate minimum shared by k docs would
    # contribute k² pair rows — same df-cap anti-join as the shingle index
    dfs = fps.groupBy("mn").agg(F.count(F.lit(1)).alias("df"))
    hot = dfs.filter(F.col("df") > _DF_CAP).select("mn")
    fpc = fps.join(F.broadcast(hot), "mn", "left_anti").transform(_tp)
    sizes = fpc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = (
        fpc.select("mn", F.col("doc_id").alias("doc_a"))
        .join(fpc.select("mn", F.col("doc_id").alias("doc_b")), "mn")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _WIN_MIN_SHARED)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_fp", "fp_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_fp", "fp_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "shared", "fp_a", "fp_b",
            (
                F.col("shared").cast("double")
                / (F.col("fp_a") + F.col("fp_b") - F.col("shared"))
            ).alias("winnow_jaccard"),
        )
    )


_WINNOW_SQL = f"""
WITH kg AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(w[i:i+{_WIN_K - 1}], ' ') AS kgram
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) - {_WIN_K - 2})) t(i)
),
h AS (SELECT doc_id, pos, {_sql_h('kgram')} AS h FROM kg),
winm AS (
  SELECT doc_id, MIN(h) OVER w AS mn, COUNT(*) OVER w AS cnt
  FROM h
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW)
),
fps AS (SELECT DISTINCT doc_id, mn FROM winm WHERE cnt = {_WIN_W}),
dfs AS (SELECT mn, COUNT(*) AS df FROM fps GROUP BY mn),
fpc AS (SELECT f.doc_id, f.mn FROM fps f JOIN dfs USING (mn)
        WHERE df <= {_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fpc GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM fpc a JOIN fpc b ON a.mn = b.mn AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_WIN_MIN_SHARED}
)
SELECT p.doc_a, p.doc_b, p.shared, sa.n_fp AS fp_a, sb.n_fp AS fp_b,
       CAST(p.shared AS DOUBLE) / (sa.n_fp + sb.n_fp - p.shared)
         AS winnow_jaccard
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
"""


# ----------------------------------------------------------- novelty
# Document novelty scoring: the fraction of a document's 5-token
# shingles whose FIRST corpus occurrence (min doc_id — the ingestion
# order) is this document. Low novelty = the document mostly restates
# earlier content — the marginal-contribution signal behind
# dedup-aware curation (an ExactSubstr-style view of redundancy at
# shingle granularity). Docs with <5 tokens have no shingles and are
# absent, like the other shingle queries.
#
# Scale: ONE shingle aggregation (min doc per shingle) — the same
# single corpus-sized shuffle as the dedup family — then per-doc counts
# come from re-grouping that output by first_doc; no shingle-keyed join
# back to the corpus at all.


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sh = _shingles_df(docs).transform(_tp)  # feeds both aggregates
    per = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    nov = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_novel"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    meta = docs.select("doc_id", "lang", "source")
    return (
        per.join(nov, "doc_id", "left")
        .join(meta, "doc_id")
        .select(
            "doc_id", "lang", "source", "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
        .withColumn(
            "novelty", F.col("n_novel").cast("double") / F.col("n_shingles")
        )
    )


_NOVELTY_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
nov AS (
  SELECT first_doc AS doc_id, COUNT(*) AS n_novel
  FROM (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
  GROUP BY first_doc
)
SELECT p.doc_id, d.lang, d.source, p.n_shingles,
       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS DOUBLE) / p.n_shingles
         AS novelty
FROM per p
LEFT JOIN nov n USING (doc_id)
JOIN documents d USING (doc_id)
"""


# ------------------------------------------------------- simhash
# 32-bit SimHash over token hashes: per bit, sign of the +1/-1 vote sum
# across tokens; near-identical docs land within small Hamming distance.
# Pure integer math.

_SIM_BITS = 32


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_TOKENS()).alias("tok"))
    hashed = toks.select("doc_id", _h(F.col("tok")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"CAST((h >> {i}) & 1 AS BIGINT) * 2 - 1")).alias(f"v{i}")
            for i in range(_SIM_BITS)
        ]
    )
    simhash = sum(
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(_SIM_BITS)
    )
    return votes.select("doc_id", simhash.cast("bigint").alias("simhash"))


def _simhash_sql() -> str:
    vote_cols = ", ".join(
        f"SUM(CAST((h >> {i}) & 1 AS BIGINT) * 2 - 1) AS v{i}" for i in range(_SIM_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(_SIM_BITS)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents),
hashed AS (SELECT doc_id, {_sql_h('tok')} AS h FROM toks),
votes AS (SELECT doc_id, {vote_cols} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM votes
"""


# ------------------------------------------------- duplicate clustering
# Connected components over the duplicate-pair graph (exact-dup star
# edges ∪ MinHash-LSH near-dup pairs): the "keep one per cluster" step a
# training pipeline runs after pair generation. Spark side is min-label
# propagation — the standard Pregel-style CC: each round one equality
# join (edges ⋈ labels, shuffle bounded by |E|) + a map-side-combined
# min-aggregate, converging in O(cluster diameter) rounds (dup clusters
# are shallow; 2-4 rounds in practice). No driver-side data beyond the
# per-round convergence count. Oracle: recursive-CTE transitive closure.


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pair edge list: exact (md5 groups) ∪ MinHash-LSH near
    pairs — shared by cluster labeling and canonical selection."""
    docs = _docs_par(spark, sf_dir)
    reps = docs.groupBy(F.md5("text").alias("m")).agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("n")
    )
    exact_edges = (
        docs.select(F.md5("text").alias("m"), "doc_id")
        .join(reps.filter(F.col("n") > 1), "m")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("doc_id").alias("dst"))
    )
    near_edges = q_doc_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    # No dedup of edges: min-propagation is idempotent over duplicate
    # edges, and a distinct would cost an extra |E| shuffle (see
    # operators/cc.py for the round structure + convergence detection).
    return exact_edges.union(near_edges)


def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cc import connected_components

    labels = connected_components(_dup_edges(spark, sf_dir))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("label")).alias("keep"),
        )
    )


def _reach_ctes() -> str:
    """Recursive transitive-closure CTE chain over the duplicate-pair
    edges (shared by the cluster and canonical oracles); yields
    `reach(a, b)` and downstream `clusters(doc_id, cluster_id)`."""
    return f"""
exact_reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep, COUNT(*) AS n
  FROM documents GROUP BY 1
),
exact_edges AS (
  SELECT r.rep AS src, d.doc_id AS dst
  FROM documents d JOIN exact_reps r ON md5(d.text) = r.m
  WHERE r.n > 1 AND d.doc_id <> r.rep
),
near AS (SELECT doc_a, doc_b FROM ({_minhash_sql()}) q),
e0 AS (SELECT src, dst FROM exact_edges UNION SELECT doc_a, doc_b FROM near),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
reach(a, b) AS (
  SELECT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)"""


def _dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE
{_reach_ctes()}
SELECT c.doc_id, c.cluster_id, s.cluster_size, c.doc_id = c.cluster_id AS keep
FROM clusters c
JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM clusters GROUP BY cluster_id) s USING (cluster_id)
"""


# --------------------------------------------------- canonical selection
# The step after clustering: per duplicate cluster keep the single best
# member by quality score (ties -> lowest doc_id) — near-dedup
# canonicalization, composed entirely from attested operators (CC labels
# + the q_doc_quality score). Spark argmax is a struct-max hash aggregate
# (map-side combined, no window sort); the quality join touches only the
# clustered docs.


def q_doc_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cc import connected_components

    labels = connected_components(_dup_edges(spark, sf_dir))
    docs = _docs_par(spark, sf_dir)
    sw = ",".join(f"'{w}'" for w in _STOPWORDS)
    quality = (
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
        .select(
            "doc_id",
            (
                (F.col("n_stop").cast("double") / F.col("n_tokens")) * 2.0
                + (1.0 - F.col("n_punct").cast("double") / F.col("n_chars"))
                + F.when(
                    (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 1.0
                ).otherwise(0.0)
            ).alias("quality_score"),
        )
    )
    j = labels.join(quality, "doc_id")
    return (
        j.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.struct("quality_score", (-F.col("doc_id")).alias("negid"))).alias("b"),
        )
        .select(
            "cluster_id",
            "n_members",
            (-F.col("b.negid")).alias("canonical_doc"),
            F.col("b.quality_score").alias("canonical_quality"),
        )
    )


def _canonical_sql() -> str:
    sw = ",".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
WITH RECURSIVE
{_reach_ctes()},
feat AS (
  SELECT doc_id, n_chars,
         CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({SQL_TOKENS}, t -> t IN ({sw}))) AS BIGINT) AS n_stop,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM documents
),
quality AS (
  SELECT doc_id,
         CAST(n_stop AS DOUBLE) / n_tokens * 2.0
           + (1.0 - CAST(n_punct AS DOUBLE) / n_chars)
           + CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
           AS quality_score
  FROM feat WHERE n_tokens > 0
),
j AS (
  SELECT cluster_id, c.doc_id, quality_score
  FROM clusters c JOIN quality q ON q.doc_id = c.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
              ORDER BY quality_score DESC, doc_id) AS rk
  FROM j
),
sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM j GROUP BY cluster_id)
SELECT r.cluster_id, s.n_members, r.doc_id AS canonical_doc,
       r.quality_score AS canonical_quality
FROM ranked r JOIN sizes s USING (cluster_id)
WHERE rk = 1
"""


# ------------------------------------------------- simhash banded pairs
# The scale path for SimHash near-dup: band the 32-bit signature into
# 4×8-bit keys; a pair within Hamming distance ≤ 3 must agree on ≥ 1
# whole band (pigeonhole: 3 flipped bits cannot touch all 4 bands), so
# the banded equality join finds EVERY such pair — this is exact banding,
# not probabilistic — and the xor/bit_count re-rank keeps true ones.
# Candidates shuffle on band keys; no all-pairs anywhere.

_SIM_PAIR_BANDS = 4
_SIM_BAND_BITS = 8
_SIM_HAM_T = 3


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = q_doc_simhash(spark, sf_dir).transform(_tp)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright(F.col("simhash"), b * _SIM_BAND_BITS) % (1 << _SIM_BAND_BITS))
                    for b in range(_SIM_PAIR_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= _SIM_HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_pairs_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, "
        f"(simhash // {1 << (b * _SIM_BAND_BITS)}) % {1 << _SIM_BAND_BITS} AS band_val "
        f"FROM sig"
        for b in range(_SIM_PAIR_BANDS)
    )
    return f"""
WITH sig AS ({_simhash_sql()}),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {_SIM_HAM_T}
"""



# ----------------------------------------------------- contamination
# Benchmark-contamination check: token 5-gram overlap between every
# corpus document and an eval set (doc_id < _EVAL_N stands in for the
# benchmark). The decontamination pass every training pipeline runs
# before release. Scale shape: the eval shingle set is tiny and
# broadcast; the corpus side streams through one semi-join — the corpus
# is never shuffled against itself.

_EVAL_N = 20


def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    # persist: the shingle pipeline feeds three branches (eval set, corpus
    # counts, corpus matches) and would otherwise re-tokenize per branch
    sh = _shingles_df(docs).transform(_tp)
    eval_sh = sh.filter(F.col("doc_id") < _EVAL_N).select("shingle").distinct()
    corpus = sh.filter(F.col("doc_id") >= _EVAL_N)
    counts = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    matched = (
        corpus.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        counts.join(matched, "doc_id")
        .withColumn(
            "contamination", F.col("n_matched").cast("double") / F.col("n_sh")
        )
        .select("doc_id", "n_sh", "n_matched", "contamination")
    )


_CONTAMINATION_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_N}),
corpus AS (SELECT * FROM sh WHERE doc_id >= {_EVAL_N}),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id),
m AS (
  SELECT doc_id, COUNT(*) AS n_matched FROM corpus
  WHERE shingle IN (SELECT shingle FROM ev) GROUP BY doc_id
)
SELECT doc_id, n_sh, n_matched,
       CAST(n_matched AS DOUBLE) / n_sh AS contamination
FROM cnt JOIN m USING (doc_id)
"""


# ------------------------------------------------------------- containment
# Containment dedup: shared / min(|A|, |B|) instead of Jaccard — catches
# the subset-duplicate (one doc embedded in a larger one) that Jaccard
# dilutes below threshold. Same df-capped inverted-index shape as
# q_doc_ngram_jaccard; only the denominator differs.

_CONTAIN_T = 0.5


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sh = _capped_shingles(docs).capped
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .withColumn(
            "containment",
            F.col("shared").cast("double")
            / F.least(F.col("ca.n_sh"), F.col("cb.n_sh")).cast("double"),
        )
        .filter(F.col("containment") >= _CONTAIN_T)
        .select("doc_a", "doc_b", "shared", "containment")
    )


_CONTAINMENT_SQL = f"""
WITH all_sh AS ({_SQL_SHINGLES}),
sh AS (
  SELECT doc_id, shingle FROM all_sh
  WHERE shingle IN (SELECT shingle FROM all_sh
                    GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP})
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       CAST(shared AS DOUBLE) / CAST(LEAST(ca.n_sh, cb.n_sh) AS DOUBLE)
         AS containment
FROM pairs
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / CAST(LEAST(ca.n_sh, cb.n_sh) AS DOUBLE)
      >= {_CONTAIN_T}
"""


# ---------------------------------------------------------- duplicate spans
# Substring-level duplication coverage (Lee et al. 2021 "Deduplicating
# Training Data" as public prior art, at shingle granularity): per doc,
# the fraction of its distinct 5-token shingles that also occur in some
# other document — the metric behind duplicate-span removal decisions.
# Shape: one shingle explode + one df aggregate + one join back; no
# self-join, so no pair explosion at any scale.


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sh = _shingles_df(docs).transform(_tp)
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup_shingles"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        F.col("n_dup_shingles").cast("bigint").alias("n_dup_shingles"),
        (F.col("n_dup_shingles").cast("double") / F.col("n_shingles")).alias(
            "dup_coverage"
        ),
        # keep iff <= 50% of the doc's shingles are duplicated elsewhere
        (F.lit(2) * F.col("n_dup_shingles") <= F.col("n_shingles"))
        .cast("int")
        .alias("keep"),
    )


_DUP_SPANS_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
dfs AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_shingles
  FROM sh JOIN dfs USING (shingle) GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_dup_shingles,
       CAST(n_dup_shingles AS DOUBLE) / n_shingles AS dup_coverage,
       CAST(2 * n_dup_shingles <= n_shingles AS INTEGER) AS keep
FROM per_doc
"""

# ------------------------------------------------------------ line dedup
# RefinedWeb/CCNet-style BOILERPLATE SEGMENT REMOVAL: the corpus has no
# newline structure, so a "line" is a fixed non-overlapping 8-token
# segment (last segment ragged). Any segment whose text appears verbatim
# in >= 2 DISTINCT documents is removed everywhere it occurs, and the
# query materializes the CLEANED corpus deterministically — per doc the
# ordered concat of retained segments, fingerprinted by md5 — so two
# engines must agree on the actual rebuilt text, not just the removal
# counts. Differs from q_doc_dup_spans (overlapping-shingle coverage
# *audit*) in that this is the cleaning *transform*: token-removal
# accounting plus the reconstructed output.
#
# Scale shape: one narrow explode (segments travel as md5 keys into the
# df aggregate — the 8-token text itself never shuffles into the
# frequency table), one seg_h groupBy, one seg_h join back, one doc_id
# aggregate whose collect_list state is bounded by the document's own
# length. No self-join, no window over the corpus.

_LINE_SEG = 8  # tokens per segment ("line") — the dedup unit


def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    k = _LINE_SEG
    segs = (
        docs.withColumn("w", _TOKENS())
        .filter(F.size("w") > 0)  # sequence(0,-1) would step backwards
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(ceil(size(w)/{k}.0) AS INT) - 1), "
                    f"i -> struct(array_join(slice(w, i*{k}+1, {k}), ' ') AS seg, "
                    f"CAST(size(slice(w, i*{k}+1, {k})) AS BIGINT) AS ntok))"
                )
            ).alias("i", "s"),
        )
        .select(
            "doc_id",
            "i",
            F.col("s.seg").alias("seg"),
            F.col("s.ntok").alias("ntok"),
            F.md5(F.col("s.seg")).alias("seg_h"),
        )
        .transform(_tp)
    )
    dfs = segs.groupBy("seg_h").agg(
        F.count_distinct("doc_id").alias("df_docs")
    )
    per = (
        segs.join(dfs, "seg_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("df_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_segments"),
            F.sum("ntok").alias("n_tokens"),
            F.sum(F.when(F.col("df_docs") >= 2, F.col("ntok")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_removed"),
            # retained segments, rebuilt in position order (i is unique
            # per doc, so the struct sort is a total order); collect_list
            # drops the NULLs the removed segments map to
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("df_docs") < 2, F.struct("i", "seg"))
                            )
                        ),
                        lambda x: x["seg"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce("n_dup_segments", F.lit(0))
        .cast("bigint")
        .alias("n_dup_segments"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("tokens_removed", F.lit(0))
        .cast("bigint")
        .alias("tokens_removed"),
        F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(1.0))
        .otherwise(
            (F.col("n_tokens") - F.col("tokens_removed")).cast("double")
            / F.col("n_tokens")
        )
        .alias("retained_frac"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


_LINE_DEDUP_SQL = f"""
WITH w AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
seg AS (
  SELECT doc_id, i,
         array_to_string(w[{_LINE_SEG}*i+1 : {_LINE_SEG}*i+{_LINE_SEG}], ' ') AS seg,
         CAST(len(w[{_LINE_SEG}*i+1 : {_LINE_SEG}*i+{_LINE_SEG}]) AS BIGINT) AS ntok
  FROM w, unnest(range(0, CAST(ceil(len(w)/{_LINE_SEG}.0) AS BIGINT))) t(i)
),
dfs AS (
  SELECT md5(seg) AS seg_h, COUNT(DISTINCT doc_id) AS df_docs
  FROM seg GROUP BY md5(seg)
),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(SUM(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_segments,
         CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN df_docs >= 2 THEN ntok ELSE 0 END) AS BIGINT)
           AS tokens_removed,
         md5(COALESCE(
           string_agg(seg, ' ' ORDER BY i) FILTER (WHERE df_docs < 2), ''))
           AS clean_md5
  FROM seg JOIN dfs ON md5(seg.seg) = dfs.seg_h
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(p.n_dup_segments, 0) AS BIGINT) AS n_dup_segments,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.tokens_removed, 0) AS BIGINT) AS tokens_removed,
       CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN CAST(1 AS DOUBLE)
            ELSE CAST(p.n_tokens - p.tokens_removed AS DOUBLE) / p.n_tokens
       END AS retained_frac,
       COALESCE(p.clean_md5, md5('')) AS clean_md5
FROM documents d LEFT JOIN per p USING (doc_id)
"""

# ---------------------------------------------------------- minhash audit
# Sketch-fidelity audit: for every LSH band candidate pair, the MinHash
# signature estimate (matches/16) next to the TRUE shingle Jaccard —
# the dedup twin of q_emb_ann_recall's "measure, don't guess" check. The
# exact side is hydrated ONLY for candidate docs (semi-join before the
# shingle equality join), so the audit never pays the all-pairs cost the
# sketch exists to avoid.


def _mh_cand_exact(docs: DataFrame):
    """Shared machinery of the MinHash audits (q_doc_minhash_audit,
    q_doc_bbit_minhash): the persisted signature table, the banded LSH
    candidate pairs, per-candidate-doc shingle counts, and the shared-
    shingle counts per pair — one builder so the banding and
    exact-Jaccard logic cannot drift between the audits.

    Round 11: ONE persisted shingle pass feeds both the signature build
    and the exact side — previously `_mh_sig(docs)` and the `shc` line
    each ran the full tokenize+shingle+distinct pipeline (guide §1.2:
    don't compute things twice). sig is bit-identical: _mh_sig is
    exactly hash→16×min over the same distinct shingle set."""
    sh = _shingles_df(docs).transform(_tp)
    sig = _sig_from_shingles(sh).transform(_tp)
    bands = _mh_bands(sig)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .transform(_tp)
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    shc = sh.join(F.broadcast(cand_docs), "doc_id").transform(_tp)
    counts = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    xa, xb = shc.alias("xa"), shc.alias("xb")
    shared = (
        xa.join(
            xb,
            (F.col("xa.shingle") == F.col("xb.shingle"))
            & (F.col("xa.doc_id") < F.col("xb.doc_id")),
        )
        .select(F.col("xa.doc_id").alias("doc_a"), F.col("xb.doc_id").alias("doc_b"))
        .join(F.broadcast(cand), ["doc_a", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return sig, cand, counts, shared


def _mh_common_ctes() -> str:
    """DuckDB twin of _mh_cand_exact: the sh/sig/bands/cand/cnt/shared
    CTE prelude both audit oracles interpolate."""
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(_PERMS)
    )
    band_keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"mh{j}" for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
        + f") AS band{b}"
        for b in range(_N_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM banded"
        for b in range(_N_BANDS)
    )
    return f"""sh AS ({_SQL_SHINGLES}),
hashed AS (SELECT doc_id, {_sql_h('shingle')} % {_P} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_keys} FROM sig),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
cnt AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh
  WHERE doc_id IN (SELECT doc_a FROM cand UNION SELECT doc_b FROM cand)
  GROUP BY doc_id
),
shared AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY 1, 2
)"""


def q_doc_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sig, cand, counts, shared = _mh_cand_exact(docs)
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(_N_PERM)
    )
    est = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matches.cast("bigint").alias("sig_matches"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    return (
        est.join(shared, ["doc_a", "doc_b"], "left")
        .withColumn("shared", F.coalesce("shared", F.lit(0)).cast("bigint"))
        .join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "sig_matches",
            (F.col("sig_matches").cast("double") / float(_N_PERM)).alias("est_jaccard"),
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("shared"))
            ).alias("exact_jaccard"),
        )
    )


# b-bit minwise hashing (Li & Konig, WWW 2010): store only the lowest
# b=4 bits of each MinHash value — a 2^b-fold signature compression (the
# difference between a 100 TB dedup index fitting in memory or not) —
# and correct the estimator for accidental low-bit collisions:
#   E[f_b] = C + (1 - C)·J  with C = 2^-b  ⇒  Ĵ = (m_b - 1) / (2^b - 1)
# per 16-perm signature (clamped at 0). The audit reports, per LSH
# candidate pair, the full-width estimate, the b-bit corrected estimate,
# and the exact Jaccard — the evidence for shipping the compressed index.
# Scale shape: identical to q_doc_minhash_audit (banded candidates, exact
# side hydrated only for candidate docs); the b-bit columns are free.

_BBIT = 4


def q_doc_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sig, cand, counts, shared = _mh_cand_exact(docs)
    sa, sb = sig.alias("sa"), sig.alias("sb")
    full = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(_N_PERM)
    )
    bb = sum(
        F.when(
            F.col(f"sa.mh{i}") % (1 << _BBIT)
            == F.col(f"sb.mh{i}") % (1 << _BBIT),
            1,
        ).otherwise(0)
        for i in range(_N_PERM)
    )
    est = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            full.cast("bigint").alias("sig_matches"),
            bb.cast("bigint").alias("bb_matches"),
        )
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    corr = _N_PERM // (1 << _BBIT)  # expected accidental matches: 16/2^b
    return (
        est.join(shared, ["doc_a", "doc_b"], "left")
        .withColumn("shared", F.coalesce("shared", F.lit(0)).cast("bigint"))
        .join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "sig_matches",
            (F.col("sig_matches").cast("double") / float(_N_PERM))
            .alias("est_full"),
            "bb_matches",
            (
                F.greatest(F.col("bb_matches") - corr, F.lit(0)).cast("double")
                / float(_N_PERM - corr)
            ).alias("est_bbit"),
            (
                F.col("shared").cast("double")
                / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("shared"))
            ).alias("exact_jaccard"),
        )
    )


def _bbit_minhash_sql() -> str:
    full_expr = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_N_PERM)
    )
    bb_expr = " + ".join(
        f"CASE WHEN sa.mh{i} % {1 << _BBIT} = sb.mh{i} % {1 << _BBIT} "
        "THEN 1 ELSE 0 END"
        for i in range(_N_PERM)
    )
    corr = _N_PERM // (1 << _BBIT)
    return f"""
WITH {_mh_common_ctes()}
SELECT c.doc_a, c.doc_b,
       CAST({full_expr} AS BIGINT) AS sig_matches,
       CAST({full_expr} AS DOUBLE) / {_N_PERM} AS est_full,
       CAST({bb_expr} AS BIGINT) AS bb_matches,
       CAST(GREATEST(({bb_expr}) - {corr}, 0) AS DOUBLE)
         / {_N_PERM - corr} AS est_bbit,
       CAST(COALESCE(s.shared, 0) AS DOUBLE)
         / (ca.n_sh + cb.n_sh - COALESCE(s.shared, 0)) AS exact_jaccard
FROM cand c
LEFT JOIN shared s ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
JOIN cnt ca ON ca.doc_id = c.doc_a
JOIN cnt cb ON cb.doc_id = c.doc_b
"""


def _minhash_audit_sql() -> str:
    match_expr = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_N_PERM)
    )
    return f"""
WITH {_mh_common_ctes()}
SELECT c.doc_a, c.doc_b,
       CAST({match_expr} AS BIGINT) AS sig_matches,
       CAST({match_expr} AS DOUBLE) / {_N_PERM} AS est_jaccard,
       CAST(COALESCE(s.shared, 0) AS BIGINT) AS shared,
       CAST(COALESCE(s.shared, 0) AS DOUBLE)
         / (ca.n_sh + cb.n_sh - COALESCE(s.shared, 0)) AS exact_jaccard
FROM cand c
LEFT JOIN shared s ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
JOIN cnt ca ON ca.doc_id = c.doc_a
JOIN cnt cb ON cb.doc_id = c.doc_b
"""


# ------------------------------------------------------- dedup agreement
# Cross-modality dedup audit: do lexical near-dup pairs (MinHash-LSH
# over token shingles) and semantic near-dup pairs (cosine-LSH over
# embeddings, restricted to ids that exist as documents) flag the same
# pairs? Reported as edge-set sizes + their Jaccard — the calibration
# check a pipeline runs before trusting one dedup modality to stand in
# for the other. (On this synthetic corpus embeddings are independent
# of text, so near-zero agreement is the honest expected answer.)
#
# PERF, considered and declined (VERDICT r3 #6): this query recomputes
# the MinHash-LSH and cosine-LSH pair sets instead of sharing a
# session-memoized copy with q_doc_minhash_lsh / q_emb_ann_lsh. A
# cross-query memo would save ~2 s once per session on an occasional
# audit query, at the cost of cache-invalidation hazards (memo keyed on
# sf_dir going stale when files change; cached frames pinning executor
# memory outside release_cached()'s contract). In a real deployment the
# pair sets are materialized TABLES the audit reads — the right sharing
# layer is storage, not driver-process memoization. Composition-by-
# recompute is the honest shape here; at 3.4 s it is the slowest query
# on the surface and still ~wash with two cold pipeline runs.


def q_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .embeddings import _NEARDUP_T, q_emb_ann_lsh

    lex = q_doc_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = _docs_par(spark, sf_dir).select("doc_id")
    sem = (
        q_emb_ann_lsh(spark, sf_dir)
        .filter(F.col("cos_sim") >= _NEARDUP_T)
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
        .join(docs.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(docs.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    j = lex.withColumn("in_lex", F.lit(1)).join(
        sem.withColumn("in_sem", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    both = F.coalesce("in_lex", F.lit(0)) * F.coalesce("in_sem", F.lit(0))
    return j.agg(
        F.sum(F.coalesce("in_lex", F.lit(0))).cast("bigint").alias("n_lexical"),
        F.sum(F.coalesce("in_sem", F.lit(0))).cast("bigint").alias("n_semantic"),
        F.sum(both).cast("bigint").alias("n_both"),
        F.count(F.lit(1)).alias("n_union"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.sum(both).cast("double") / F.count(F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("edge_jaccard"),
    )


def _dedup_agreement_sql() -> str:
    from .embeddings import _NEARDUP_T, _ann_lsh_sql

    return f"""
WITH lex AS (SELECT doc_a, doc_b FROM ({_minhash_sql()}) q),
sem0 AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b
  FROM ({_ann_lsh_sql()}) q WHERE cos_sim >= {_NEARDUP_T}
),
sem AS (
  SELECT * FROM sem0
  WHERE doc_a IN (SELECT doc_id FROM documents)
    AND doc_b IN (SELECT doc_id FROM documents)
),
j AS (
  SELECT CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_lex,
         CASE WHEN s.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_sem
  FROM lex l FULL OUTER JOIN sem s
    ON l.doc_a = s.doc_a AND l.doc_b = s.doc_b
)
SELECT CAST(SUM(in_lex) AS BIGINT) AS n_lexical,
       CAST(SUM(in_sem) AS BIGINT) AS n_semantic,
       CAST(SUM(in_lex * in_sem) AS BIGINT) AS n_both,
       COUNT(*) AS n_union,
       CASE WHEN COUNT(*) > 0
            THEN CAST(SUM(in_lex * in_sem) AS DOUBLE) / COUNT(*)
            ELSE 0.0 END AS edge_jaccard
FROM j
"""


# ------------------------------------------------ LSH operating point
# LSH parameter audit: the empirical detection curve of the 4x4 banding
# against exact shingle Jaccard, next to the theoretical S-curve
# P(candidate | s) = 1 - (1 - s^r)^b at each bucket midpoint — the
# operating-point check a dedup pipeline runs before trusting its
# (bands, rows) choice at a new similarity threshold. Ground truth =
# every pair sharing >= 1 (df-capped) shingle with its exact Jaccard;
# detection = membership in the RAW band-candidate set (before the
# est-Jaccard re-rank filter). On this corpus the truth is bimodal
# (planted near-dups vs background), so the curve shows the two regimes
# the banding must separate.
#
# Scale: same bounded shapes as q_doc_ngram_jaccard (df-capped inverted
# index) and q_doc_minhash_lsh (band-bucket join); output is <= 10 rows.
# Theory powers are explicit multiplications (identical IEEE expression
# text in both dialects — no pow()).


def q_doc_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    # one shingle pass: the capped table feeds the truth side, the
    # uncapped sibling feeds the MinHash banding (round 11 — previously
    # _mh_sig re-ran the whole tokenize+shingle+distinct pipeline)
    sh, all_sh = _capped_shingles(docs)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    truth = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .withColumn(
            "jac",
            F.col("shared").cast("double")
            / (F.col("na") + F.col("nb") - F.col("shared")),
        )
    )
    bands = _mh_bands(_sig_from_shingles(all_sh))
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        .withColumn("detected", F.lit(1))
    )
    r, nb_ = _ROWS_PER_BAND, _N_BANDS
    s_mid = "(CAST(2 * bucket + 1 AS DOUBLE) / 20)"
    s4 = f"({s_mid} * {s_mid} * {s_mid} * {s_mid})"
    q1 = f"(CAST(1 AS DOUBLE) - {s4})"
    theory = f"CAST(1 AS DOUBLE) - {q1} * {q1} * {q1} * {q1}"
    assert (r, nb_) == (4, 4)  # the unrolled powers above ARE (r, b)
    return (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .withColumn(
            "bucket",
            F.least(F.floor(F.col("jac") * 10), F.lit(9)).cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce("detected", F.lit(0))).cast("bigint")
            .alias("n_detected"),
        )
        .select(
            "bucket", "n_pairs", "n_detected",
            (F.col("n_detected").cast("double") / F.col("n_pairs"))
            .alias("detect_rate"),
            F.expr(theory).alias("theory_rate"),
        )
    )


def _lsh_tuning_sql() -> str:
    s_mid = "(CAST(2 * bucket + 1 AS DOUBLE) / 20)"
    s4 = f"({s_mid} * {s_mid} * {s_mid} * {s_mid})"
    q1 = f"(CAST(1 AS DOUBLE) - {s4})"
    theory = f"CAST(1 AS DOUBLE) - {q1} * {q1} * {q1} * {q1}"
    mins, band_keys, band_rows = _mh_sql_fragments()
    return f"""
WITH all_sh AS ({_SQL_SHINGLES}),
sh AS (
  SELECT doc_id, shingle FROM all_sh
  WHERE shingle IN (SELECT shingle FROM all_sh
                    GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP})
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
truth AS (
  SELECT doc_a, doc_b, shared,
         CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared) AS jac
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
),
hashed AS (SELECT doc_id, {_sql_h('shingle')} % {_P} AS h FROM all_sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_keys} FROM sig),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, 1 AS detected
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
),
bucketed AS (
  SELECT CAST(LEAST(FLOOR(t.jac * 10), 9) AS INT) AS bucket,
         COALESCE(c.detected, 0) AS detected
  FROM truth t
  LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT bucket, COUNT(*) AS n_pairs,
       CAST(SUM(detected) AS BIGINT) AS n_detected,
       CAST(SUM(detected) AS DOUBLE) / COUNT(*) AS detect_rate,
       {theory} AS theory_rate
FROM bucketed GROUP BY bucket
"""


# ------------------------------------------------ dedup method eval
# Precision/recall scorecard of every cheap near-dup detector against
# the exact shingle-Jaccard ground truth (jaccard >= 0.5): MinHash-LSH,
# SimHash banded Hamming, and winnowing fingerprints each predict a
# pair set; this query scores them — the evaluation a pipeline runs
# before picking which detector guards a 100 TB dedup pass. One row per
# method: predicted/truth/true-positive counts, precision, recall, F1
# (exact counts, three final divisions).
#
# Scale: each input is an already-bounded pair set (banded/df-capped);
# the scorecard joins pair lists, never documents. Like
# q_dedup_agreement, it recomputes its input pipelines rather than
# memoizing across queries (see the PERF note there) — the slowest
# composite on the surface (~7 s at sf0.1), which is the cost of four
# cold pipeline runs, not of the scorecard.

_EVAL_METHODS = ("minhash_lsh", "simhash", "winnow")


def q_dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE tokenize+shingle pass feeds the exact-Jaccard truth (capped
    # side) AND the MinHash arm's signatures (uncapped side; identical
    # signatures — MIN over set = MIN over multiset). Round 12: the r11
    # receipt deferred this as ~1 s at sf0.1; the refactored
    # _ngram_jaccard_scored/_minhash_lsh_scored seams made it a
    # contained change, the interleaved A/B read 6.36 vs 6.13 s min-of-3
    # with rows identical, and at corpus scale it deletes one full
    # tokenize+shingle pass (guide §1.2).
    docs = _docs_par(spark, sf_dir)
    shs = _capped_shingles(docs)
    truth = (
        _ngram_jaccard_scored(shs.capped)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
        .transform(_tp)  # joined by all three methods + counted once
    )
    preds = [
        _minhash_lsh_scored(_sig_from_shingles(shs.uncapped).transform(_tp))
        .select("doc_a", "doc_b")
        .withColumn("method", F.lit("minhash_lsh")),
        q_doc_simhash_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("method", F.lit("simhash")),
        q_doc_winnow_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("method", F.lit("winnow")),
    ]
    pred = preds[0]
    for p in preds[1:]:
        pred = pred.unionByName(p)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    scored = (
        pred.join(truth, ["doc_a", "doc_b"], "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_pred"),
            F.sum(F.coalesce("in_truth", F.lit(0))).cast("bigint").alias("tp"),
        )
        .join(n_truth)
    )
    prec = F.col("tp").cast("double") / F.col("n_pred")
    rec = F.col("tp").cast("double") / F.col("n_truth")
    return scored.select(
        "method", "n_pred", "n_truth", "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(F.col("tp") > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def _dedup_method_eval_sql() -> str:
    return f"""
WITH truth AS (
  SELECT doc_a, doc_b, 1 AS in_truth FROM ({_NGRAM_JACCARD_SQL}) q
),
pred AS (
  SELECT doc_a, doc_b, 'minhash_lsh' AS method FROM ({_minhash_sql()}) q
  UNION ALL
  SELECT doc_a, doc_b, 'simhash' AS method FROM ({_simhash_pairs_sql()}) q
  UNION ALL
  SELECT doc_a, doc_b, 'winnow' AS method FROM ({_WINNOW_SQL}) q
),
nt AS (SELECT COUNT(*) AS n_truth FROM truth),
scored AS (
  SELECT method, COUNT(*) AS n_pred,
         CAST(SUM(COALESCE(in_truth, 0)) AS BIGINT) AS tp
  FROM pred LEFT JOIN truth USING (doc_a, doc_b)
  GROUP BY method
)
SELECT method, n_pred, n_truth, tp,
       CAST(tp AS DOUBLE) / n_pred AS precision,
       CAST(tp AS DOUBLE) / n_truth AS recall,
       CASE WHEN tp > 0
            THEN 2 * (CAST(tp AS DOUBLE) / n_pred)
                   * (CAST(tp AS DOUBLE) / n_truth)
                 / ((CAST(tp AS DOUBLE) / n_pred)
                    + (CAST(tp AS DOUBLE) / n_truth))
            ELSE 0.0 END AS f1
FROM scored CROSS JOIN nt
"""


# -------------------------------------------------- dup-graph triangles
# Transitivity audit of the near-dup graph: triangles and wedges over
# the MinHash-LSH candidate edges, with the global clustering
# coefficient 3·triangles/wedges — the structural check behind "can I
# trust single-link clustering here?" (high transitivity → near-dup is
# behaving like an equivalence relation; low → chains of barely-similar
# docs are bridging unrelated clusters and CC labels will over-merge).
#
# Scale: the canonical two-join triangle count over the bounded LSH
# edge set (edges are already oriented doc_a < doc_b so each triangle
# counts once). At web scale you would orient by DEGREE, not id, to
# bound the join fan-out on hub nodes; the df-capped LSH graph keeps
# id-orientation safe here. Wedges are Σ C(deg, 2) — one degree
# aggregate, no join.


def q_doc_dup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        q_doc_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .transform(_tp)  # feeds three triangle-join sides + the degrees
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        edges.join(stats)
        .join(tri)
        .select(
            "n_edges", "n_nodes", "n_wedges",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.when(
                F.col("n_wedges") > 0,
                (3 * F.col("n_triangles")).cast("double") / F.col("n_wedges"),
            )
            .otherwise(F.lit(0.0))
            .alias("transitivity"),
        )
    )


def _dup_transitivity_sql() -> str:
    return f"""
WITH e AS (SELECT doc_a AS a, doc_b AS b FROM ({_minhash_sql()}) q),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
),
stats AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
edges AS (SELECT COUNT(*) AS n_edges FROM e)
SELECT n_edges, n_nodes, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN CAST(3 * n_triangles AS DOUBLE) / n_wedges
            ELSE 0.0 END AS transitivity
FROM edges CROSS JOIN stats CROSS JOIN tri
"""


# ------------------------------------------- cross-source duplication
# Which sources copy from which: the (source_a, source_b) duplication
# matrix — exact-duplicate pairs plus MinHash-LSH near-dup candidate
# pairs per source pair. The provenance view behind licensing audits and
# mixture design ("is src7 just a mirror of src3?").
#
# Scale: exact pairs are counted WITHOUT materializing them — a 1M-copy
# content group would explode into 5e11 pairs, but its per-source
# histogram is ≤ |sources| rows, and the pair count is a product over
# that histogram (c_a·c_b across sources, C(c,2) within). Near pairs
# ride the already-bounded LSH candidate set. Output ≤ |sources|² cells.


def q_doc_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    hist = docs.groupBy(F.md5("text").alias("m"), "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    a, b = hist.alias("a"), hist.alias("b")
    exact = (
        a.join(
            b,
            (F.col("a.m") == F.col("b.m"))
            & (F.col("a.source") <= F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.when(
                F.col("a.source") == F.col("b.source"),
                F.expr("a.c * (a.c - 1) div 2"),
            )
            .otherwise(F.expr("a.c * b.c"))
            .alias("pairs"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum("pairs").cast("bigint").alias("n_exact_pairs"))
    )
    meta_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    meta_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    near = (
        q_doc_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .join(meta_a, "doc_a")
        .join(meta_b, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_near_pairs"))
    )
    return (
        exact.join(near, ["source_a", "source_b"], "full_outer")
        .select(
            "source_a",
            "source_b",
            F.coalesce("n_exact_pairs", F.lit(0)).cast("bigint")
            .alias("n_exact_pairs"),
            F.coalesce("n_near_pairs", F.lit(0)).cast("bigint")
            .alias("n_near_pairs"),
            (F.col("source_a") != F.col("source_b")).alias("is_cross"),
        )
    )


def _cross_source_dup_sql() -> str:
    return f"""
WITH hist AS (
  SELECT md5(text) AS m, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
exact AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2
                       ELSE a.c * b.c END) AS BIGINT) AS n_exact_pairs
  FROM hist a JOIN hist b ON a.m = b.m AND a.source <= b.source
  GROUP BY 1, 2
),
near AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_near_pairs
  FROM ({_minhash_sql()}) q
  JOIN documents da ON da.doc_id = q.doc_a
  JOIN documents db ON db.doc_id = q.doc_b
  GROUP BY 1, 2
)
SELECT COALESCE(e.source_a, n.source_a) AS source_a,
       COALESCE(e.source_b, n.source_b) AS source_b,
       CAST(COALESCE(e.n_exact_pairs, 0) AS BIGINT) AS n_exact_pairs,
       CAST(COALESCE(n.n_near_pairs, 0) AS BIGINT) AS n_near_pairs,
       COALESCE(e.source_a, n.source_a) <> COALESCE(e.source_b, n.source_b)
         AS is_cross
FROM exact e FULL OUTER JOIN near n
  ON e.source_a = n.source_a AND e.source_b = n.source_b
"""


# --------------------------------------------------------------- dup runs
# Exact duplicated-substring extent (the ExactSubstr signal of Lee et al.
# 2022, arXiv:2107.06499, at shingle granularity): for every document
# pair sharing ≥ _RUN_MIN_SH consecutive 5-token shingles, the length of
# the LONGEST verbatim shared token run. Set-based near-dup (Jaccard,
# MinHash) can't distinguish a scattered 30% overlap from a single
# copied paragraph; this query can — a run of r shingles certifies a
# verbatim copy of r+4 consecutive tokens.
#
# Shape: positional shingles (one explode, no distinct), df-capped on
# DISTINCT-doc frequency exactly like the other inverted-index dedup
# queries (the hot list broadcasts); the equality self-join on shingle
# hash is the same bounded join as q_doc_ngram_jaccard; then runs are
# gaps-and-islands per anti-diagonal (pos_a − pos_b): within one
# diagonal, consecutive matched positions = consecutive shared shingles,
# so island length = run length — two windows over the matched-position
# table, no per-pair re-scan of text. All integers end-to-end.

_RUN_MIN_SH = 3  # report pairs sharing a run of ≥3 shingles (≥7 tokens)


def _pos_shingles_sql() -> str:
    return f"""
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         {_sql_h(f"array_to_string(w[i:i+{_SHINGLE - 1}], ' ')")} AS h
  FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
       unnest(range(1, len(w) - {_SHINGLE - 2})) t(i)
"""


def q_doc_dup_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs_par(spark, sf_dir)
    sh = F.expr(
        f"CASE WHEN size(w) >= {_SHINGLE} THEN "
        f"transform(sequence(0, size(w) - {_SHINGLE}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {_SHINGLE}))) "
        "ELSE array() END"
    )
    pos_sh = (
        docs.select("doc_id", _TOKENS().alias("w"))
        .select("doc_id", F.posexplode(sh).alias("pos", "shingle"))
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"),
                _h(F.col("shingle")).alias("h"))
        .transform(_tp)
    )
    hot = (
        pos_sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > _DF_CAP)
        .select("h")
    )
    capped = pos_sh.join(F.broadcast(hot), "h", "left_anti")
    a = capped.alias("a")
    b = capped.alias("b")
    matched = a.join(
        b,
        (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = (
        matched.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_sh"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run_sh").cast("bigint").alias("max_run_shingles"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.sum("run_sh").cast("bigint").alias("n_matched"),
        )
        .filter(F.col("max_run_shingles") >= _RUN_MIN_SH)
        .withColumn(
            "longest_run_tokens",
            (F.col("max_run_shingles") + F.lit(_SHINGLE - 1)).cast("bigint"),
        )
    )


def _dup_runs_sql() -> str:
    return f"""
WITH pos_sh AS ({_pos_shingles_sql()}),
capped AS (
  SELECT doc_id, pos, h FROM pos_sh
  WHERE h IN (SELECT h FROM pos_sh
              GROUP BY h HAVING COUNT(DISTINCT doc_id) <= {_DF_CAP})
),
matched AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, diag,
         pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pos_a) AS grp
  FROM matched
),
islands AS (
  SELECT doc_a, doc_b, diag, grp, COUNT(*) AS run_sh
  FROM runs GROUP BY doc_a, doc_b, diag, grp
),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(MAX(run_sh) AS BIGINT) AS max_run_shingles,
         CAST(COUNT(*) AS BIGINT) AS n_runs,
         CAST(SUM(run_sh) AS BIGINT) AS n_matched
  FROM islands GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, max_run_shingles, n_runs, n_matched,
       max_run_shingles + {_SHINGLE - 1} AS longest_run_tokens
FROM pairs WHERE max_run_shingles >= {_RUN_MIN_SH}
"""




# ------------------------------------------- duplicated-substring audit
# The ExactSubstr corpus audit (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better") re-expressed relationally: a token
# position is DUPLICATED when any _SHINGLE-gram covering it occurs >= 2
# times corpus-wide; consecutive duplicated positions merge into spans
# (the substrings ExactSubstr would cut). Rolled up per lang: how much
# of each stratum is corpus-duplicated text, and in how many spans.
#
# Scale shape: tokens explode once; gram construction, coverage and
# span detection are all windows over the SAME (doc_id, pos) spec — one
# doc-partitioned sort serves every window step, and doc_id is
# high-cardinality so the windows parallelize; the gram count and the
# join-back both hash-partition on the gram. At web scale the gram
# string becomes a 64-bit hash with a df-cap on the count side (the
# _DF_CAP precedent above); exact strings keep the toy oracle exact.


def q_doc_dup_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    # g is NULL unless a FULL K-gram starts here. Array-native (round
    # 11): one row per token position with the gram built from the
    # token array — identical rows to the previous posexplode +
    # lead-window shape, minus a full corpus sort (the downstream
    # coverage/lag windows re-sort after the gram join anyway, so the
    # construction sort bought nothing)
    g_arr = F.expr(
        f"CASE WHEN size(w) >= 1 THEN transform(sequence(0, size(w) - 1),"
        f" i -> named_struct('pos', i, 'g',"
        f" CASE WHEN i + {_SHINGLE} <= size(w)"
        f" THEN concat_ws(' ', slice(w, i + 1, {_SHINGLE})) END))"
        " ELSE array() END"
    )
    grams = (
        _docs_par(spark, sf_dir)
        .select("doc_id", "lang", _TOKENS().alias("w"))
        .select("doc_id", "lang", F.explode(g_arr).alias("_t"))
        .select("doc_id", "lang", "_t.pos", "_t.g")
    ).transform(_tp)
    dup_g = (
        grams.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("g", F.lit(1).alias("ds"))
    )
    flagged = grams.join(dup_g, "g", "left").select(
        "doc_id", "lang", "pos", F.coalesce("ds", F.lit(0)).alias("ds")
    )
    cov_w = wd.rowsBetween(-(_SHINGLE - 1), Window.currentRow)
    covered = flagged.select(
        "doc_id",
        "lang",
        "pos",
        F.max("ds").over(cov_w).alias("cov"),
    )
    spans = covered.select(
        "doc_id",
        "lang",
        "cov",
        F.when(
            (F.col("cov") == 1)
            & (F.coalesce(F.lag("cov").over(wd), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    )
    return spans.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("cov").cast("bigint").alias("dup_tokens"),
        F.count_distinct(
            F.when(F.col("cov") == 1, F.col("doc_id"))
        ).alias("docs_with_dup"),
        F.sum("new_span").cast("bigint").alias("n_spans"),
        F.when(F.count(F.lit(1)) == 0, F.lit(0.0))
        .otherwise(
            F.sum("cov").cast("double") / F.count(F.lit(1)).cast("double")
        )
        .alias("dup_fraction"),
    )


_DUP_ISLANDS_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(w) AS w, generate_subscripts(w, 1) AS pos
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS w FROM documents)
),
grams AS (
  SELECT doc_id, lang, pos,
         CASE WHEN LEAD(w, {_SHINGLE - 1}) OVER wd IS NOT NULL THEN
           w || ' ' || {" || ' ' || ".join(f"LEAD(w, {i}) OVER wd" for i in range(1, _SHINGLE))}
         END AS g
  FROM toks
  WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
),
dup_g AS (
  SELECT g FROM grams WHERE g IS NOT NULL GROUP BY g HAVING COUNT(*) >= 2
),
flagged AS (
  SELECT doc_id, lang, pos,
         CASE WHEN g IN (SELECT g FROM dup_g) THEN 1 ELSE 0 END AS ds
  FROM grams
),
covered AS (
  SELECT doc_id, lang, pos,
         MAX(ds) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {_SHINGLE - 1} PRECEDING AND CURRENT ROW)
           AS cov
  FROM flagged
),
spans AS (
  SELECT doc_id, lang, cov,
         CASE WHEN cov = 1 AND COALESCE(
                LAG(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS new_span
  FROM covered
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(cov) AS BIGINT) AS dup_tokens,
       CAST(COUNT(DISTINCT CASE WHEN cov = 1 THEN doc_id END) AS BIGINT)
         AS docs_with_dup,
       CAST(SUM(new_span) AS BIGINT) AS n_spans,
       CASE WHEN COUNT(*) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(SUM(cov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       END AS dup_fraction
FROM spans
GROUP BY lang
"""
