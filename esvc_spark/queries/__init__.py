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
    # Round-11 (optimization round) rotation: (a) the four round-11-build
    # queries still without any driver row (CORRECTNESS_r10 predates
    # them), (b) every query whose EXECUTION PATH this optimization
    # round changed — array-native bigrams/winnowing/grams, single
    # shingle pass, multiset MinHash signatures, persisted re-evaluated
    # subtrees, IVF-store search/maintenance job cuts — each re-proven
    # against the oracle locally but needing a fresh driver row, and
    # (c) the oldest (r5-vintage) attestation backlog filling to 50.
    # -- (a) never driver-graded (r11 build) --
    "q_emb_ivf_plan",
    "q_emb_pq_train",
    "q_emb_ivf_merge",
    "q_emb_ivfpq_store",
    # -- (b) execution paths changed by optimization round 1 --
    "q_emb_ivf_split",
    "q_stream_emb_index",
    "q_emb_db_index",
    "q_doc_lm_score",
    "q_doc_ccnet_buckets",
    "q_doc_textrank",
    "q_doc_bpe_merges",
    "q_doc_bpe_encode",
    "q_doc_domain_reweight",
    "q_doc_leakage_split",
    "q_doc_minhash_lsh",
    "q_doc_upsert",
    "q_doc_dup_clusters",
    "q_doc_canonical",
    "q_dedup_agreement",
    "q_doc_dup_transitivity",
    "q_dedup_method_eval",
    "q_doc_cross_source_dup",
    "q_doc_minhash_audit",
    "q_doc_bbit_minhash",
    "q_doc_lsh_tuning",
    "q_doc_winnow_pairs",
    "q_doc_dup_islands",
    "q_ev_kmv_windows",
    # -- (c) r5-vintage attestation backlog (oldest green rows) --
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
    "q_doc_entropy",
    "q_doc_jackknife",
    "q_doc_novelty",
    "q_doc_signal_corr",
    "q_doc_source_overlap",
    "q_emb_drift",
    "q_emb_kcenter",
    "q_ev_asof_nearest",
    "q_ev_bot_detect",
    "q_ev_dedup_content",
    "q_ev_forecast",
    "q_ev_funnel_latency",
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
