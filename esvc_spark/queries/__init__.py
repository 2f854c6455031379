"""The declared query surface.

Each submodule exposes two dicts:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]       # DuckDB-runnable ANSI SQL (may omit keys
                                  # for non-SQL-expressible operators)

`all_queries()` / `all_oracles()` merge them for __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registry order matters: the driver's correctness harness has a time
# budget and truncates the tail (~50 rows/round). Coverage rotates:
# _FRONT holds every query that is new or changed this round (needs a
# fresh driver row) ordered roughly by contract criticality; queries
# with green rows from earlier rounds absorb the truncation. Rotate at
# the START of each round: drop freshly-graded names from _FRONT, add
# anything new/changed. ATTESTATION.md is the ledger of which driver
# round last graded each query — update it when CORRECTNESS_r{N}.json
# lands.
#
# Round-8 rotation: front (a) the seven round-8 new queries (the
# streamed event-log loop; the ExactSubstr positional duplicated-span
# audit; and the second-session additions — line-dedup boilerplate
# removal, per-source host caps, l-diversity, the epoch-shuffle
# manifest, the streamed ANN-index loop), (b) every query whose plan
# or output path changed this round — the 11 size-gated rank/prefix
# rewrites plus q_ev_watermark_plan's running max, the ingest-contract
# empty-table guard, the two distributed-editor queries whose corpus
# partition count now scales with |documents|, and q_ev_k_anonymity
# (shares the release-audit scaffolding since the session-2 refactor)
# — and (c) the 24 r2-vintage backlog rows the r7 driver budget
# truncated (VERDICT r7 #2: the r7 front held 74 candidates for a
# 50-row budget; this front holds 46, so every row is graded this
# round). Everything else holds a green r3+ driver row and absorbs any
# truncation.
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # NEW this round: streamed event-log append/head/compaction loop +
    # the ExactSubstr duplicated-substring audit
    "q_stream_event_log",
    "q_doc_dup_islands",
    "q_doc_line_dedup",
    "q_doc_host_caps",
    "q_ev_l_diversity",
    "q_ev_k_anonymity",  # shares the release-audit scaffolding since r8
    "q_doc_shuffle_shards",
    "q_stream_emb_index",
    # changed this round: size-gated rank/prefix helpers (local window
    # at or below TWO_PHASE_MIN_ROWS, two-phase checkpoint plan above)
    "q_ev_rfm",
    "q_window_deciles",
    "q_ev_watermark_plan",
    "q_histogram_selectivity",
    "q_encoding_advisor",
    "q_ev_mad_outliers",
    "q_doc_pack",
    "q_doc_neyman_sample",
    "q_doc_ccnet_buckets",
    "q_zonemap_skipping",
    "q_zorder_layout",
    # changed this round: empty-table guard (coalesced badness sums)
    "q_dq_ingest_contract",
    # changed this round: corpus-scaled partition count in _word_lines
    "q_esvc_editor_large",
    "q_esvc_merge_large",
    # r2-vintage attestation backlog, truncated from the r7 front
    "q_doc_negatives",
    "q_doc_ngram_jaccard",
    "q_doc_normalize",
    "q_doc_quality",
    "q_doc_sample_mixture",
    "q_doc_simhash",
    "q_doc_simhash_pairs",
    "q_doc_split",
    "q_doc_tfidf_top",
    "q_doc_token_stats",
    "q_doc_upsample",
    "q_doc_vocab",
    "q_emb_kmeans",
    "q_emb_label_centroids",
    "q_emb_pq",
    "q_emb_quantize_int8",
    "q_esvc_merge",
    "q_esvc_replay",
    "q_ev_asof_purchase",
    "q_ev_range_pairs",
    "q_ev_tumbling_hourly",
    "q_mm_decode_stats",
    "q_mm_frame_sample",
    "q_mm_resize",
)


def _modules():
    from . import documents, embeddings, esvc, events, multimodal, relational

    by_name = {
        "documents": documents,
        "embeddings": embeddings,
        "esvc": esvc,
        "events": events,
        "multimodal": multimodal,
        "relational": relational,
    }
    return [by_name[n] for n in _MODULE_ORDER]


def _reorder(merged: dict) -> dict:
    front = {n: merged[n] for n in _FRONT if n in merged}
    front.update((n, v) for n, v in merged.items() if n not in front)
    return front


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return _reorder(merged)


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return _reorder(merged)
