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
    # Round-12 (optimization round 2) rotation — rotated LAST, after the
    # final code commit (VERDICT r11 #3 rule): (a) every query whose
    # EXECUTION PATH this round changed — the IVF-store job-count pass
    # (memos, map-side probe ranking + ADC table, bounded probe collect,
    # concurrent compaction, driver-side proof compares), the esvc
    # engine's commute plan-build dedup + bucketed renumber, the shared
    # tokenize+shingle pass in the dedup family, the event-log stream
    # batch rewrite — each re-proven against the oracle locally but
    # needing a fresh driver row; (b) VERDICT r11 #3's two queries whose
    # b7a4e55 changes landed after the r11 rotation; (c) the oldest
    # (r5/r6-vintage) attestation backlog filling to 50.
    # -- (a) execution paths changed by optimization round 2 --
    "q_emb_ivf_split",
    "q_emb_ivf_merge",
    "q_emb_ivfpq_store",
    "q_stream_emb_index",
    "q_emb_ivf_plan",
    "q_emb_pq_train",
    "q_esvc_editor",
    "q_esvc_editor_large",
    "q_esvc_merge",
    "q_esvc_merge_large",
    "q_esvc_replay",
    "q_esvc_import_file",
    "q_dedup_method_eval",
    "q_doc_ngram_jaccard",
    "q_doc_minhash_lsh",
    "q_doc_containment",
    "q_doc_lsh_tuning",
    "q_stream_event_log",
    # -- (b) VERDICT r11 #3: changed after the r11 rotation --
    "q_zonemap_skipping",
    "q_ev_mad_outliers",
    # -- (c) oldest attestation backlog (r5/r6-vintage green rows) --
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
    "q_doc_gopher_rules",
    "q_doc_readability",
    "q_emb_ann_lsh",
    "q_emb_cluster_agreement",
    "q_emb_dup_clusters",
    "q_emb_ivf_balance",
    "q_emb_matryoshka",
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
