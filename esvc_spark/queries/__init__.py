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
# Round-10 rotation: front (a) the round-10 NEW query q_emb_ivf_split
# (split_cell maintenance under the oracle gate: hottest-cell split +
# codebook-version/probe-map search transparency proof — exercises the
# r10-changed ann_store.search seams and the split_cell epsilon/
# non-empty-subcell guards), (b) q_stream_emb_index, whose execution
# path changed (compact_cells defragmentation pass after the streamed
# appends), and (c) the entire r4-vintage attestation backlog (35
# rows, now the oldest green rows per ATTESTATION.md). 37 names,
# inside the driver's ~50-row budget. Everything else holds a green
# r5+ driver row and absorbs any truncation.
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # NEW this round: split-cell maintenance transparency proof
    "q_emb_ivf_split",
    # changed this round: compact_cells maintenance pass after the
    # streamed appends (inventory oracle doubles as the verbatim proof)
    "q_stream_emb_index",
    # r4-vintage attestation backlog (oldest green rows)
    "q_benford_audit",
    "q_bloom_join_filter",
    "q_doc_bbit_minhash",
    "q_doc_calibration",
    "q_doc_dsir",
    "q_doc_dup_runs",
    "q_doc_heaps",
    "q_doc_langid_eval",
    "q_doc_quality_auc",
    "q_doc_threshold_sweep",
    "q_doc_weighted_sample",
    "q_doc_zipf",
    "q_dq_checks",
    "q_emb_db_index",
    "q_emb_pca_power",
    "q_ev_ab_test",
    "q_ev_acf",
    "q_ev_bootstrap_ci",
    "q_ev_bursts",
    "q_ev_gdpr_erasure",
    "q_ev_markov_attribution",
    "q_ev_power_analysis",
    "q_ev_psi_drift",
    "q_ev_scd2",
    "q_ev_seasonality",
    "q_ev_slo_burn",
    "q_ev_stickiness",
    "q_ev_survival",
    "q_ivm_join",
    "q_join_card_audit",
    "q_mm_phash_dedup",
    "q_profile_lineitem",
    "q_skyline_customers",
    "q_stream_ingest_log",
    "q_stream_left_join",
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
