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
# Round-7 rotation (the plan the r6 registry comment promised): front
# (a) the round-7 new/changed queries — the ingest-contract gate, the
# four partition-parallel ranking rewrites, the NULL-tiebreak and
# degenerate-label fixes, the uuid-table bucket audit; (b) ALL 42
# remaining r1/r2-vintage rows, whose latest driver grade predates the
# r2 numeric-helper rewrite and the r6 NULL convention. 50 slots
# exactly; everything else holds a green r3+ row and absorbs the
# truncation. (q_window_deciles joined mid-round — the same NTILE class,
# found by the new PLANS.md 1p column — pushing the front to 51; the
# driver budget truncates the last backlog row, which stays covered by
# the full verify.)
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # NEW this round: the executable ingest contract
    "q_dq_ingest_contract",
    # changed this round: partition-parallel global ranking
    "q_ev_gini",
    "q_ev_rfm",
    "q_doc_textrank",
    "q_doc_rake",
    "q_window_deciles",
    "q_ev_watermark_plan",
    "q_histogram_selectivity",
    "q_encoding_advisor",
    "q_ev_mad_outliers",
    "q_doc_pack",
    "q_doc_neyman_sample",
    "q_doc_ccnet_buckets",
    # changed this round: two-phase per-group top-k (operators/topk.py)
    "q_emb_knn_cosine",
    "q_emb_ivf_knn",
    "q_rag_retrieval",
    "q_emb_pq_search",
    "q_emb_binary_hamming",
    "q_emb_recall_curve",
    "q_emb_mmr",
    "q_emb_filtered_ann",
    "q_emb_hard_negatives",
    "q_emb_ivfpq_search",
    "q_emb_cluster_sample",
    "q_emb_ann_recall",
    "q_doc_bm25",
    "q_doc_rrf_fusion",
    "q_mm_audio_match",
    "q_zonemap_skipping",
    "q_zorder_layout",
    # changed this round: NULL-label majority tiebreak pin /
    # degenerate-label ood convention / uuid bucket tables
    "q_emb_label_consistency",
    "q_emb_ood",
    "q_bucket_join_audit",
    # r1/r2-vintage attestation backlog (latest driver rows predate the
    # r2 dsum/decimal rewrite and the r6 NULL convention)
    "q16_parts_supplier",
    "q_window_running_spend",
    "q_window_top_orders",
    "q_dataset_card",
    "q_doc_bigrams",
    "q_doc_bpe_tokens",
    "q_doc_canonical",
    "q_doc_contamination",
    "q_doc_curation",
    "q_doc_dup_clusters",
    "q_doc_exact_dedup",
    "q_doc_fingerprint",
    "q_doc_incremental_dedup",
    "q_doc_lang_id",
    "q_doc_length_hist",
    "q_doc_lm_score",
    "q_doc_minhash_lsh",
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
