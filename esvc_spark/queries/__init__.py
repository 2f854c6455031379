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
# Round-11 rotation: front (a) the round-11 NEW queries — q_emb_ivf_merge
# (merge_cells maintenance under the oracle gate, the last pipeline
# component without a driver row, VERDICT r10 #1), (b) the two queries
# whose execution paths changed this round — q_emb_ivf_split (split_cell
# now runs entry-time crash-residue recovery) and q_stream_emb_index
# (the store's load/heal seams changed) — and (c) the entire r5-vintage
# attestation backlog (39 rows, now the oldest green rows per
# ATTESTATION.md). 42 names, inside the driver's ~50-row budget.
# Everything else holds a green r6+ driver row and absorbs truncation.
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # NEW this round: merge-cells maintenance proof + persisted IVF-PQ
    # + the PQ codebook trainer and maintenance planner under the gate
    "q_emb_ivf_plan",
    "q_emb_pq_train",
    "q_emb_ivf_merge",
    "q_emb_ivfpq_store",
    # changed execution paths this round (ann_store recovery seams)
    "q_emb_ivf_split",
    "q_stream_emb_index",
    # r5-vintage attestation backlog (oldest green rows)
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q_dedup_method_eval",
    "q_doc_cross_source_dup",
    "q_doc_dup_transitivity",
    "q_doc_entropy",
    "q_doc_jackknife",
    "q_doc_leakage_split",
    "q_doc_lsh_tuning",
    "q_doc_novelty",
    "q_doc_signal_corr",
    "q_doc_source_overlap",
    "q_doc_winnow_pairs",
    "q_emb_drift",
    "q_emb_kcenter",
    "q_ev_asof_nearest",
    "q_ev_bot_detect",
    "q_ev_dedup_content",
    "q_ev_forecast",
    "q_ev_funnel_latency",
    "q_ev_incremental_agg",
    "q_ev_json_props",
    "q_ev_key_skew",
    "q_ev_ltv",
    "q_ev_percentiles",
    "q_ev_predictability",
    "q_ev_sessionize",
    "q_ev_user_journey",
    "q_mm_scene_cuts",
    "q_stream_anomaly",
    "q_window_trailing_spend",
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
