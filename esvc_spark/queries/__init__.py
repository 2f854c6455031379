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
# Round-6 rotation: (a) every query whose code OR oracle changed this
# round — the zero-norm cosine guard rewrote the shared helper pair
# (functions/vectors.py) and its DuckDB twins, touching the 19 queries
# on the cosine path, and streaming_head_tracker gained the
# pending-supersession state (q_stream_heads); (b) the 18 r1-vintage
# rows whose latest driver row predates the r2 dsum/decimal helper
# rewrite; (c) r2-vintage doc/esvc fillers to round the budget to 50.
# Remaining r1/r2-vintage tail (42 doc/mm/ev/emb/esvc rows incl. the
# six displaced below by the NULL-convention changes, among them
# q16_parts_supplier) fronts round 7, leaving ≤8 slots for round-7
# new/changed queries.
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # NEW this round: Gopher rule battery, TextRank keywords, kNN
    # label-noise audit, readability battery, IVF cell-balance audit
    "q_doc_gopher_rules",
    "q_doc_textrank",
    "q_emb_label_consistency",
    "q_doc_readability",
    "q_emb_ivf_balance",
    "q_part_prune_audit",
    "q_bucket_join_audit",
    "q_ev_k_anonymity",
    "q_emb_ivfpq_search",
    # changed this round: order-independent head tracker state
    "q_stream_heads",
    # changed this round: zero-norm cosine convention in both dialects
    "q_emb_knn_cosine",
    "q_emb_neardup_cosine",
    "q_emb_ann_lsh",
    "q_emb_ann_recall",
    "q_emb_ivf_knn",
    "q_emb_hard_negatives",
    "q_emb_matryoshka",
    "q_emb_binary_hamming",
    "q_emb_cluster_agreement",
    "q_emb_cluster_sample",
    "q_emb_dup_clusters",
    "q_emb_filtered_ann",
    "q_emb_mmr",
    "q_emb_recall_curve",
    "q_emb_semdedup",
    "q_emb_shard_plan",
    "q_rag_retrieval",
    "q_doc_rrf_fusion",
    "q_dedup_agreement",
    # changed this round: NULL-convention guards (value IS NOT NULL /
    # NULLS FIRST pins / sketch NULL-subject exclusion) and the
    # density-free head oracle — see the degenerate suite's null seeds
    "q_ev_rfm",
    "q_ev_approx_quantiles",
    "q_ev_mad_outliers",
    "q_ev_hll_union",
    "q_stream_running_totals",
    "q_doc_domain_reweight",
    # r1-vintage attestation: latest driver rows predate the r2
    # dsum/decimal helper rewrite
    "q11_value_concentration",
    "q12_ship_lag",
    "q13_customer_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_excess_stock",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "q_cube_orders",
    "q_grouping_sets",
    "q_rollup_returns",
    "q_setops_customers",
    # (q_window_running_spend / q_window_top_orders and the r2-vintage
    # fillers moved to the round-7 backlog: the five NULL-convention
    # changes above outrank freshness rotation for the 50-slot budget)
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
