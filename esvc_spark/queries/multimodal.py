"""Multimodal-column queries: the mapInPandas decode/feature/frame stages
of esvc_spark.operators.multimodal, aggregated to oracle-checkable stats.

The fake decode is exact integer byte math and the payloads are ASCII
text, so DuckDB can reproduce byte sums (codepoint == byte) and md5
content addresses exactly. `q_mm_features` emits each chunk-mean feature
as its exact integer (sum, len) pair so even the feature stage is
hash-checkable; the float vector stage (`extract_features`) remains for
downstream embedding consumers and is covered structurally in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tracked_persist as _tp
from ..operators.multimodal import (
    _KINDS,
    audio_windows,
    decode_stats,
    extract_feature_sums,
    frame_sample,
    media_table,
    resize_images,
)

_SQL_KIND = (
    "CASE doc_id % 3 "
    + " ".join(f"WHEN {i} THEN '{k}'" for i, k in enumerate(_KINDS))
    + " END"
)


def q_mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = decode_stats(media_table(spark, sf_dir))
    return stats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("byte_sum").alias("total_byte_sum"),
        F.max("byte_max").alias("max_byte"),
        F.count_distinct("content_md5").alias("n_distinct"),
    )


_DECODE_STATS_SQL = f"""
WITH media AS (
  SELECT doc_id, text, {_SQL_KIND} AS kind FROM documents
),
decoded AS (
  SELECT doc_id, kind,
         CAST(length(text) AS BIGINT) AS n_bytes,
         -- empty-payload guard: unicode('') = -1, see _FEATURES_SQL
         CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(COALESCE(list_sum(list_transform(string_split(text, ''),
                                          c -> unicode(c))), 0) AS BIGINT)
              END AS byte_sum,
         CASE WHEN length(text) = 0 THEN 0
              ELSE CAST(COALESCE(list_max(list_transform(string_split(text, ''),
                                          c -> unicode(c))), 0) AS INTEGER)
              END AS byte_max,
         md5(text) AS content_md5
  FROM media
)
SELECT kind, COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum, MAX(byte_max) AS max_byte,
       COUNT(DISTINCT content_md5) AS n_distinct
FROM decoded GROUP BY kind
"""

_EVERY_N = 4


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(media_table(spark, sf_dir), every_n=_EVERY_N)
    return frames.select("doc_id", "frame_idx", "frame_md5")


_FRAME_SQL = f"""
WITH media AS (
  SELECT doc_id, text, {_SQL_KIND} AS kind,
         CAST(n_chars % 24 + 1 AS INTEGER) AS n_frames
  FROM documents
),
video AS (SELECT * FROM media WHERE kind = 'video'),
sized AS (
  SELECT doc_id, text, n_frames,
         GREATEST(length(text) // n_frames, 1) AS fsize
  FROM video
)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       md5(substr(text, i * fsize + 1, fsize)) AS frame_md5
FROM sized, unnest(range(0, n_frames, {_EVERY_N})) t(i)
"""


_FEAT_DIM = 16


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage with an exact oracle: each float feature
    of `extract_features` is chunk_sum/chunk_len, so the query emits the
    integer pair per chunk (same rational-pair trick as q_doc_tfidf_top's
    idf) and DuckDB rebuilds every value from sliced codepoints."""
    return extract_feature_sums(media_table(spark, sf_dir), dim=_FEAT_DIM)


_FEATURES_SQL = f"""
WITH sized AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
),
chunks AS (
  SELECT doc_id, text, CAST(i AS INTEGER) AS chunk_idx,
         CAST(i * (n // {_FEAT_DIM}) + LEAST(i, n % {_FEAT_DIM}) AS BIGINT) AS lo,
         CAST(n // {_FEAT_DIM}
              + CASE WHEN i < n % {_FEAT_DIM} THEN 1 ELSE 0 END AS BIGINT)
           AS chunk_len
  FROM sized, unnest(range(0, {_FEAT_DIM})) t(i)
)
SELECT doc_id, chunk_idx,
       -- empty chunk guard: string_split('','') is [''] and unicode('')
       -- is -1 in DuckDB, so the bare fold would yield -1 where the
       -- operator emits exactly 0 for a zero-length chunk
       CASE WHEN chunk_len = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(COALESCE(list_sum(list_transform(
                   string_split(substr(text, lo + 1, chunk_len), ''),
                   c -> unicode(c))), 0) AS BIGINT) END AS chunk_sum,
       chunk_len
FROM chunks
"""



_MAX_SIDE = 64


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image thumbnail plumbing, oracle-checked byte-for-byte (integer
    fit + nearest-neighbor subsample; ASCII payloads so SQL can rebuild
    the resized bytes)."""
    return resize_images(media_table(spark, sf_dir), max_side=_MAX_SIDE)


_RESIZE_SQL = f"""
WITH media AS (
  SELECT doc_id, text, {{kind}} AS kind,
         CAST(n_chars % 640 + 1 AS INTEGER) AS w,
         CAST(n_chars % 480 + 1 AS INTEGER) AS h
  FROM documents
),
img AS (SELECT * FROM media WHERE kind = 'image'),
dims AS (
  SELECT doc_id, text, w, h, GREATEST(w, h) AS side,
         CASE WHEN GREATEST(w, h) <= {_MAX_SIDE} THEN w
              ELSE GREATEST(w * {_MAX_SIDE} // GREATEST(w, h), 1) END AS new_w,
         CASE WHEN GREATEST(w, h) <= {_MAX_SIDE} THEN h
              ELSE GREATEST(h * {_MAX_SIDE} // GREATEST(w, h), 1) END AS new_h
  FROM img
),
sized AS (
  SELECT doc_id, text, new_w, new_h,
         LEAST(length(text), new_w * new_h) AS m, length(text) AS n
  FROM dims
)
SELECT doc_id, new_w, new_h, CAST(m AS BIGINT) AS out_bytes,
       md5(COALESCE(list_aggregate(
             list_transform(range(0, m), i -> substr(text, (i * n) // m + 1, 1)),
             'string_agg', ''), '')) AS resized_md5
FROM sized
""".format(kind=_SQL_KIND)


_AUDIO_WIN = 32


def q_mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing (fixed 32-sample windows with energy/peak),
    oracle-checked byte-for-byte — completes the per-kind multimodal
    stages (image: resize, video: frame_sample, audio: windows)."""
    return audio_windows(media_table(spark, sf_dir), win=_AUDIO_WIN)


_AUDIO_SQL = f"""
WITH media AS (
  SELECT doc_id, text, {_SQL_KIND} AS kind FROM documents
),
audio AS (SELECT * FROM media WHERE kind = 'audio'),
w AS (
  SELECT doc_id, CAST(i AS INT) AS window_idx,
         substr(text, CAST(i AS INT) * {_AUDIO_WIN} + 1, {_AUDIO_WIN}) AS seg
  FROM audio,
       unnest(range(0, GREATEST((length(text) + {_AUDIO_WIN - 1}) // {_AUDIO_WIN},
                                1))) t(i)
)
SELECT doc_id, window_idx, CAST(length(seg) AS BIGINT) AS n_samples,
       -- empty-window guard: unicode('') = -1 in DuckDB, so an empty
       -- payload's single window would fold to energy 1 / peak -1
       -- where the operator emits exact zeros
       CASE WHEN length(seg) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(COALESCE(list_sum(list_transform(string_split(seg, ''),
                                        c -> unicode(c) * unicode(c))), 0)
                 AS BIGINT) END AS energy,
       CASE WHEN length(seg) = 0 THEN 0
            ELSE CAST(COALESCE(list_max(list_transform(string_split(seg, ''),
                                        c -> unicode(c))), 0)
                 AS INTEGER) END AS peak
FROM w
"""


# Energy-threshold voice-activity segmentation composed on top of
# audio_windows: a window is "active" when its energy clears the
# threshold; consecutive active windows form segments (gaps-and-islands
# via one lag window over window_idx). Per-doc segment counts and the
# longest segment — the VAD/segmentation stage of an audio pipeline,
# in exact integer arithmetic end to end.

_VAD_ENERGY = 310_000  # ≈ median window energy on ASCII payloads —
# chosen so activity flips mid-document and the island logic is exercised
# (at sf0.01: 949/1670 active windows forming 444 segments)


def q_mm_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = audio_windows(media_table(spark, sf_dir), win=_AUDIO_WIN)
    flagged = w.withColumn(
        "active", (F.col("energy") >= _VAD_ENERGY).cast("int")
    )
    lagw = Window.partitionBy("doc_id").orderBy("window_idx")
    runs = flagged.withColumn(
        "run_start",
        (
            (F.col("active") == 1)
            & (F.coalesce(F.lag("active").over(lagw), F.lit(0)) == 0)
        ).cast("int"),
    ).withColumn(
        "seg_id",
        F.when(
            F.col("active") == 1, F.sum("run_start").over(lagw)
        ),
    )
    seg_lens = (
        runs.filter(F.col("active") == 1)
        .groupBy("doc_id", "seg_id")
        .agg(F.count(F.lit(1)).alias("seg_len"))
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("active").cast("bigint").alias("n_active"),
        F.sum("run_start").cast("bigint").alias("n_segments"),
    )
    longest = seg_lens.groupBy("doc_id").agg(F.max("seg_len").alias("longest_segment"))
    return per_doc.join(longest, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        "n_active",
        "n_segments",
        F.coalesce("longest_segment", F.lit(0)).cast("bigint").alias("longest_segment"),
    )


_SILENCE_SQL = f"""
WITH media AS (
  SELECT doc_id, text, {_SQL_KIND} AS kind FROM documents
),
audio AS (SELECT * FROM media WHERE kind = 'audio'),
w AS (
  SELECT doc_id, CAST(i AS INT) AS window_idx,
         substr(text, CAST(i AS INT) * {_AUDIO_WIN} + 1, {_AUDIO_WIN}) AS seg
  FROM audio,
       unnest(range(0, GREATEST((length(text) + {_AUDIO_WIN - 1}) // {_AUDIO_WIN},
                                1))) t(i)
),
en AS (
  SELECT doc_id, window_idx,
         -- empty-window guard: unicode('') = -1, see _AUDIO_SQL
         CASE WHEN length(seg) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(COALESCE(list_sum(list_transform(string_split(seg, ''),
                                          c -> unicode(c) * unicode(c))), 0)
                   AS BIGINT) END AS energy
  FROM w
),
flagged AS (
  SELECT doc_id, window_idx,
         CASE WHEN energy >= {_VAD_ENERGY} THEN 1 ELSE 0 END AS active
  FROM en
),
runs AS (
  SELECT doc_id, window_idx, active,
         CASE WHEN active = 1 AND COALESCE(LAG(active) OVER
                (PARTITION BY doc_id ORDER BY window_idx), 0) = 0
              THEN 1 ELSE 0 END AS run_start
  FROM flagged
),
seg_ids AS (
  SELECT doc_id, active,
         SUM(run_start) OVER (PARTITION BY doc_id ORDER BY window_idx
                              ROWS UNBOUNDED PRECEDING) AS seg_id
  FROM runs
),
seg_lens AS (
  SELECT doc_id, seg_id, COUNT(*) AS seg_len
  FROM seg_ids WHERE active = 1 GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(active) AS BIGINT) AS n_active,
         CAST(SUM(run_start) AS BIGINT) AS n_segments
  FROM runs GROUP BY doc_id
),
longest AS (SELECT doc_id, MAX(seg_len) AS longest_segment FROM seg_lens GROUP BY 1)
SELECT p.doc_id, p.n_windows, p.n_active, p.n_segments,
       CAST(COALESCE(l.longest_segment, 0) AS BIGINT) AS longest_segment
FROM per_doc p LEFT JOIN longest l USING (doc_id)
"""


# ---------------------------------------------------- perceptual dedup
# Average-hash (aHash) near-dup grouping for media payloads: one bit per
# feature chunk — is the chunk mean above the whole-payload mean — packed
# into a 16-bit fingerprint; payloads bucket by (kind, ahash), so
# re-encoded/lightly-perturbed copies that defeat exact md5 dedup land in
# the same bucket. n_exact (distinct md5 per bucket) > 1 is the
# perceptual-dup signal. The compare is cross-multiplied integers
# (chunk_sum·total_len > total_sum·chunk_len) — no division, exact in
# both engines. Scale: one mapInPandas feature pass, a doc-partition
# window, one groupBy — fingerprints shuffle, payloads never do.


def _ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit average-hash fingerprint (one bit per feature
    chunk: chunk mean above whole-payload mean) — shared by the exact
    bucket dedup (q_mm_phash_dedup) and the banded-Hamming near-dup
    clustering (q_mm_phash_neardup), one builder so the fingerprint
    cannot drift between the two."""
    from pyspark.sql import Window

    sums = extract_feature_sums(media_table(spark, sf_dir))
    w = Window.partitionBy("doc_id")
    bits = sums.withColumn("tsum", F.sum("chunk_sum").over(w)).withColumn(
        "tlen", F.sum("chunk_len").over(w)
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("chunk_sum") * F.col("tlen")
                > F.col("tsum") * F.col("chunk_len"),
                F.pow(F.lit(2.0), F.col("chunk_idx").cast("double")).cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ahash")
    )


def q_mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table as T

    ah = _ahash(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("cmd5")
    )
    kinds = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return (
        ah.join(docs, "doc_id")
        .withColumn("kind", kinds)
        .groupBy("kind", "ahash")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("cmd5").alias("n_exact"),
            F.min("doc_id").alias("rep_doc"),
        )
    )


_PHASH_SQL = f"""
WITH feats AS ({_FEATURES_SQL}),
tot AS (
  SELECT doc_id, chunk_idx, chunk_sum, chunk_len,
         CAST(SUM(chunk_sum) OVER (PARTITION BY doc_id) AS BIGINT) AS tsum,
         CAST(SUM(chunk_len) OVER (PARTITION BY doc_id) AS BIGINT) AS tlen
  FROM feats
),
ah AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN chunk_sum * tlen > tsum * chunk_len
                  THEN CAST(pow(2, chunk_idx) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS ahash
  FROM tot GROUP BY doc_id
)
SELECT {_SQL_KIND} AS kind, ahash, COUNT(*) AS n_items,
       COUNT(DISTINCT md5(text)) AS n_exact,
       MIN(d.doc_id) AS rep_doc
FROM ah JOIN documents d USING (doc_id)
GROUP BY {_SQL_KIND}, ahash
"""


# ---------------------------------------------------------- scene cuts
# Shot-boundary detection over the video payloads: per-frame byte-sum
# signatures (operators.multimodal.frame_stats, every frame), a cut
# wherever the absolute signature delta exceeds 10× the frame size
# (|mean byte shift| > 10 — ~p90 of this corpus's transitions, so cuts
# are a real minority class), then scenes as the islands between cuts —
# the video-curation stage that picks segment boundaries before frame
# sampling. All integers: delta, threshold compare, island ids (running
# cut count), segment lengths.
#
# Scale: the mapInPandas signature pass is narrow over payload
# partitions; the windows run per video over ≤ meta.n_frames rows; the
# final table is one row per video.

_CUT_X = 10


def q_mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.multimodal import frame_stats

    fs = frame_stats(media_table(spark, sf_dir))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = (
        fs.withColumn("prev_sum", F.lag("frame_sum").over(w))
        .withColumn(
            "is_cut",
            (
                F.col("prev_sum").isNotNull()
                & (
                    F.abs(F.col("frame_sum") - F.col("prev_sum"))
                    > _CUT_X * F.col("fsize")
                )
            ).cast("int"),
        )
        .withColumn(
            "scene_id",
            F.sum("is_cut").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    ).transform(_tp)  # feeds the per-scene AND per-doc aggregates: without
    # the persist the mapInPandas decode pass + both windows run twice
    scenes = d.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).alias("scene_len")
    )
    return (
        d.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("is_cut").cast("bigint").alias("n_cuts"),
            F.sum(F.abs(F.col("frame_sum") - F.coalesce("prev_sum", "frame_sum")))
            .cast("bigint")
            .alias("sum_abs_delta"),
        )
        .join(
            scenes.groupBy("doc_id").agg(
                F.max("scene_len").cast("bigint").alias("longest_scene")
            ),
            "doc_id",
        )
        .select(
            "doc_id", "n_frames", "n_cuts",
            (F.col("n_cuts") + 1).cast("bigint").alias("n_scenes"),
            "longest_scene", "sum_abs_delta",
        )
    )


_SCENE_SQL = f"""
WITH media AS (
  SELECT doc_id, text, CAST(n_chars % 24 + 1 AS INTEGER) AS n_frames
  FROM documents WHERE {_SQL_KIND} = 'video'
),
sized AS (
  SELECT doc_id, text, n_frames,
         GREATEST(length(text) // n_frames, 1) AS fsize
  FROM media
),
frames AS (
  -- empty-slice guard: substr past the payload end is '' and
  -- string_split('','') yields [''] with unicode('') = -1 (the
  -- q_mm_features pitfall), so pin zero-length frames to sum 0
  SELECT doc_id, CAST(i AS INT) AS frame_idx, CAST(fsize AS BIGINT) AS fsize,
         CASE WHEN length(substr(text, i * fsize + 1, fsize)) = 0
              THEN CAST(0 AS BIGINT)
              ELSE CAST(COALESCE(list_sum(list_transform(
                     string_split(substr(text, i * fsize + 1, fsize), ''),
                     c -> unicode(c))), 0) AS BIGINT)
              END AS frame_sum
  FROM sized, unnest(range(0, n_frames)) t(i)
),
d AS (
  SELECT doc_id, frame_idx, fsize, frame_sum,
         LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
           AS prev_sum
  FROM frames
),
marked AS (
  SELECT *,
         CASE WHEN prev_sum IS NOT NULL
                   AND abs(frame_sum - prev_sum) > {_CUT_X} * fsize
              THEN 1 ELSE 0 END AS is_cut
  FROM d
),
ids AS (
  SELECT *,
         SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                           ROWS UNBOUNDED PRECEDING) AS scene_id
  FROM marked
),
scenes AS (
  SELECT doc_id, scene_id, COUNT(*) AS scene_len FROM ids GROUP BY 1, 2
),
per AS (
  SELECT doc_id, COUNT(*) AS n_frames,
         CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
         CAST(SUM(abs(frame_sum - COALESCE(prev_sum, frame_sum))) AS BIGINT)
           AS sum_abs_delta
  FROM ids GROUP BY doc_id
)
SELECT p.doc_id, p.n_frames, p.n_cuts,
       CAST(p.n_cuts + 1 AS BIGINT) AS n_scenes,
       CAST(s.longest_scene AS BIGINT) AS longest_scene, p.sum_abs_delta
FROM per p
JOIN (SELECT doc_id, MAX(scene_len) AS longest_scene FROM scenes GROUP BY 1) s
  USING (doc_id)
"""


# ------------------------------------------------------ image near-dup CC
# Perceptual NEAR-duplicate image clustering — q_mm_phash_dedup catches
# only bit-identical fingerprints; here images whose 16-bit aHashes
# differ by Hamming ≤ 2 become edges and connected components labels the
# clusters (same CC discipline as the text/embedding dedup graphs).
# Candidate generation is pigeonhole banding (6+5+5 bits: ≤2 flipped
# bits leave ≥1 band intact — guaranteed recall, no all-pairs), then the
# exact popcount filter. Scale shape: fingerprints shuffle (2 bytes per
# image), payloads never; edges are banding-bounded; CC runs min-label
# rounds with checkpointed lineage (operators/cc.py).

_PN_HAM = 2


def q_mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cc import connected_components

    ah = _ahash(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)  # images
    banded = ah.select(
        "doc_id",
        "ahash",
        F.expr("ahash % 64").alias("b0"),
        F.expr("(ahash div 64) % 32").alias("b1"),
        F.expr("ahash div 2048").alias("b2"),
    ).transform(_tp)
    cand = None
    for i in range(3):
        a, b = banded.alias("a"), banded.alias("b")
        part = a.join(
            b,
            (F.col(f"a.b{i}") == F.col(f"b.b{i}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ah_a"),
            F.col("b.ahash").alias("ah_b"),
        )
        cand = part if cand is None else cand.unionByName(part)
    edges = (
        cand.distinct()
        .filter(F.expr(f"bit_count(ah_a ^ ah_b) <= {_PN_HAM}"))
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labels = connected_components(edges)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("label")).alias("keep"),
    )


_PHASH_NEARDUP_SQL = f"""
WITH RECURSIVE feats AS ({_FEATURES_SQL}),
tot AS (
  SELECT doc_id, chunk_idx, chunk_sum, chunk_len,
         CAST(SUM(chunk_sum) OVER (PARTITION BY doc_id) AS BIGINT) AS tsum,
         CAST(SUM(chunk_len) OVER (PARTITION BY doc_id) AS BIGINT) AS tlen
  FROM feats
),
ah AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(CASE WHEN chunk_sum * tlen > tsum * chunk_len
                       THEN CAST(pow(2.0, chunk_idx) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ahash
  FROM tot WHERE doc_id % 3 = 0
  GROUP BY doc_id
),
banded AS (
  SELECT doc_id, ahash, ahash % 64 AS b0, (ahash // 64) % 32 AS b1,
         ahash // 2048 AS b2
  FROM ah
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.ahash AS ah_a, b.ahash AS ah_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id
   AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2)
),
e0 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  WHERE bit_count(xor(ah_a, ah_b)) <= {_PN_HAM}
),
edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
reach(a, b) AS (
  SELECT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       c.doc_id = c.cluster_id AS keep
FROM clusters c
JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM clusters GROUP BY cluster_id) s USING (cluster_id)
"""


# ------------------------------------------------------ audio fingerprinting
# Landmark-constellation audio matching (the Shazam algorithm, Wang 2003)
# over the synthetic audio corpus: each window's PEAK byte stands in for
# a spectrogram peak frequency; landmarks are (f1, f2, Δ) pairs of peaks
# Δ ∈ {1,2,3} windows apart; a 16-window query clip cut from the middle
# of each of the 5 lowest audio docs is matched against the full corpus
# index by landmark-key equi-join + time-offset VOTING (the match is the
# (doc, offset) cell with the most consistent landmark hits — invariant:
# every clip re-finds its source doc at offset = clip start). Scale
# shape: the corpus is touched once through the mapInPandas window stage;
# the query landmark table is tiny and BROADCASTS into the index join
# (fingerprints shuffle, payloads never do); voting is a bounded
# (query × doc × offset) aggregate. At web scale the landmark key space
# would be df-capped like the shingle index (hot boilerplate keys carry
# no localization signal).

_AM_QMAX = 15  # query set: audio docs with doc_id < 15 (5 clips)
_AM_CLIP_LO = 4
_AM_CLIP_HI = 19  # inclusive; 16-window clips
_AM_DELTAS = (1, 2, 3)


def q_mm_audio_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        audio_windows(media_table(spark, sf_dir), win=_AUDIO_WIN)
        .select("doc_id", "window_idx", "peak")
        .transform(_tp)  # feeds the corpus index AND the query clips
    )
    deltas = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(d) for d in _AM_DELTAS])).alias("delta")
    )
    lm = (
        w.join(F.broadcast(deltas))  # 3-row lattice: landmark fan-out
        .select(
            "doc_id",
            F.col("window_idx").alias("t"),
            F.col("peak").alias("f1"),
            "delta",
            (F.col("window_idx") + F.col("delta")).alias("t2"),
        )
        .join(
            w.select(
                "doc_id",
                F.col("window_idx").alias("t2"),
                F.col("peak").alias("f2"),
            ),
            ["doc_id", "t2"],
        )
        .select("doc_id", "t", "f1", "f2", "delta")
        .transform(_tp)
    )
    qlm = lm.filter(
        (F.col("doc_id") < _AM_QMAX)
        & (F.col("t") >= _AM_CLIP_LO)
        & (F.col("t") <= _AM_CLIP_HI - F.col("delta"))
    ).select(
        F.col("doc_id").alias("query_id"),
        (F.col("t") - _AM_CLIP_LO).alias("tq"),
        "f1",
        "f2",
        "delta",
    )
    votes = (
        lm.join(F.broadcast(qlm), ["f1", "f2", "delta"])
        .groupBy(
            "query_id", "doc_id", (F.col("t") - F.col("tq")).alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
    )
    # two-phase per-query argmax (operators/topk.py, k=1): the vote
    # table is one row per matching (doc, offset) pair — corpus-
    # proportional for a common constellation
    from ..operators.topk import topk_per_group

    return (
        topk_per_group(
            votes,
            ["query_id"],
            [F.desc("votes"), F.asc("doc_id"), F.asc("offset")],
            1,
            "rnk",
        )
        .select(
            "query_id",
            F.col("doc_id").alias("matched_doc"),
            F.col("offset").alias("match_offset"),
            "votes",
            F.when(
                (F.col("doc_id") == F.col("query_id"))
                & (F.col("offset") == _AM_CLIP_LO),
                1,
            ).otherwise(0).alias("self_match"),
        )
    )


def _audio_match_sql() -> str:
    deltas = ", ".join(f"({d})" for d in _AM_DELTAS)
    return f"""
WITH media AS (
  SELECT doc_id, text, {_SQL_KIND} AS kind FROM documents
),
audio AS (SELECT * FROM media WHERE kind = 'audio'),
w AS (
  SELECT doc_id, CAST(i AS INT) AS window_idx,
         substr(text, CAST(i AS INT) * {_AUDIO_WIN} + 1, {_AUDIO_WIN}) AS seg
  FROM audio,
       unnest(range(0, GREATEST((length(text) + {_AUDIO_WIN - 1}) // {_AUDIO_WIN},
                                1))) t(i)
),
pk AS (
  SELECT doc_id, window_idx,
         -- empty-window guard: unicode('') = -1, see _AUDIO_SQL
         CASE WHEN length(seg) = 0 THEN 0
              ELSE CAST(COALESCE(list_max(list_transform(string_split(seg, ''),
                                          c -> unicode(c))), 0)
                   AS INTEGER) END AS peak
  FROM w
),
lm AS (
  SELECT a.doc_id, a.window_idx AS t, a.peak AS f1, b.peak AS f2, d.delta
  FROM pk a, (SELECT delta FROM (VALUES {deltas}) v(delta)) d, pk b
  WHERE b.doc_id = a.doc_id AND b.window_idx = a.window_idx + d.delta
),
qlm AS (
  SELECT doc_id AS query_id, t - {_AM_CLIP_LO} AS tq, f1, f2, delta
  FROM lm
  WHERE doc_id < {_AM_QMAX} AND t >= {_AM_CLIP_LO}
    AND t <= {_AM_CLIP_HI} - delta
),
votes AS (
  -- "offset" is reserved in DuckDB; use off_ internally
  SELECT query_id, lm.doc_id, lm.t - qlm.tq AS off_,
         CAST(COUNT(*) AS BIGINT) AS votes
  FROM lm JOIN qlm USING (f1, f2, delta)
  GROUP BY 1, 2, 3
)
SELECT query_id, doc_id AS matched_doc, off_ AS match_offset, votes,
       CASE WHEN doc_id = query_id AND off_ = {_AM_CLIP_LO}
            THEN 1 ELSE 0 END AS self_match
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY votes DESC, doc_id, off_) AS rnk
  FROM votes
) WHERE rnk = 1
"""


QUERIES = {
    "q_mm_audio_match": q_mm_audio_match,
    "q_mm_phash_neardup": q_mm_phash_neardup,
    "q_mm_decode_stats": q_mm_decode_stats,
    "q_mm_frame_sample": q_mm_frame_sample,
    "q_mm_resize": q_mm_resize,
    "q_mm_features": q_mm_features,
    "q_mm_audio_windows": q_mm_audio_windows,
    "q_mm_silence": q_mm_silence,
    "q_mm_phash_dedup": q_mm_phash_dedup,
    "q_mm_scene_cuts": q_mm_scene_cuts,
}

ORACLES = {
    "q_mm_features": _FEATURES_SQL,
    "q_mm_resize": _RESIZE_SQL,
    "q_mm_decode_stats": _DECODE_STATS_SQL,
    "q_mm_frame_sample": _FRAME_SQL,
    "q_mm_audio_windows": _AUDIO_SQL,
    "q_mm_silence": _SILENCE_SQL,
    "q_mm_phash_dedup": _PHASH_SQL,
    "q_mm_scene_cuts": _SCENE_SQL,
    "q_mm_audio_match": _audio_match_sql(),
    "q_mm_phash_neardup": _PHASH_NEARDUP_SQL,
}
