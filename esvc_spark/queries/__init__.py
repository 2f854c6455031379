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
# Round-9 rotation: front (a) every query whose execution path changed
# this round — the five esvc queries plus q_stream_event_log (the
# shelve commutation tests are now batched/persist-free with
# identical-state job skips, proven output-identical by differential
# test), q_stream_emb_index (IVFIndexStore: narrow centroid
# assignment, cell-clustered build layout, empty-codebook guard,
# intra-batch idempotent dedup, bigint cells schema), and
# q_doc_shuffle_shards (Chernoff-proved max_group_rows bound threaded
# into the rank gate) — (b) the round-9 NEW query
# q_esvc_import_file (reference bincode+zstd graph-file round-trip
# under the oracle gate) — and (c) the entire r3-vintage backlog (38
# rows, the oldest green attestations per ATTESTATION.md). 47 names,
# inside the driver's ~50-row budget. Everything else holds a green
# r4+ driver row and absorbs any truncation.
_MODULE_ORDER = ("esvc", "multimodal", "embeddings", "documents", "events", "relational")

_FRONT = (
    # changed this round: batched/persist-free shelve commutation path
    "q_esvc_editor",
    "q_esvc_editor_large",
    "q_esvc_merge",
    "q_esvc_merge_large",
    "q_esvc_replay",
    # NEW this round: reference graph-file round-trip under the gate
    "q_esvc_import_file",
    "q_stream_event_log",
    # changed this round: IVFIndexStore build/assignment/schema fixes
    "q_stream_emb_index",
    # changed this round: proven shard-balance bound in the rank gate
    "q_doc_shuffle_shards",
    # r3-vintage attestation backlog (oldest green rows)
    "q_doc_bpe_encode",
    "q_doc_bpe_merges",
    "q_doc_chunk",
    "q_doc_containment",
    "q_doc_dup_spans",
    "q_doc_minhash_audit",
    "q_doc_pii_redact",
    "q_doc_repetition",
    "q_doc_upsert",
    "q_ev_anomaly",
    "q_ev_attribution",
    "q_ev_audience_overlap",
    "q_ev_bloom",
    "q_ev_changepoints",
    "q_ev_cms_heavy",
    "q_ev_cohort_retention",
    "q_ev_funnel",
    "q_ev_hll_distinct",
    "q_ev_kmv_distinct",
    "q_ev_kmv_windows",
    "q_ev_lift",
    "q_ev_pagerank",
    "q_ev_resample",
    "q_ev_salted_distinct",
    "q_ev_sliding_counts",
    "q_ev_top_paths",
    "q_fullouter_daily",
    "q_fuzzy_match",
    "q_mm_audio_windows",
    "q_mm_silence",
    "q_pivot_returns",
    "q_stream_dedup",
    "q_stream_enrich",
    "q_stream_join",
    "q_stream_sessionize",
    "q_stream_topk",
    "q_stream_tumbling_hourly",
    "q_unpivot_orders",
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
