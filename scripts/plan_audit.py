"""Generate PLANS.md: the physical-plan profile of every declared query.

The table records, per query, what actually matters at cluster scale —
shuffle count, broadcast joins vs sort-merge joins, nested-loop joins
(acceptable only with a scalar/tiny broadcast side), and whether filters
reached the parquet scan. Re-run after plan-affecting changes:

    python scripts/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# queries whose physical plan is not a single static DAG
_IMPERATIVE = {
    "q_bucket_join_audit": (
        "bucketed temp write (8 buckets on custkey, both sides) + "
        "exchange-free SortMergeJoin (bucket-to-bucket, broadcast disabled "
        "under scoped conf — asserted live in tests/test_plans.py); "
        "returned frame is the checkpointed per-segment aggregate"
    ),
    "q_part_prune_audit": (
        "Hive-partitioned temp write + pruned one-day read (PartitionFilters "
        "lists 1 of 30 day dirs — asserted live in tests/test_plans.py); "
        "returned frame is the checkpointed per-type day aggregate"
    ),
    "q_esvc_import_file": (
        "driver-side REPL round-trip over a bounded 40-row slice: export "
        "to the reference's bincode+zstd file format, hash-verified "
        "reimport + rehash + merge (core/bincode_io.py); returned frame "
        "is a local createDataFrame of the materialized document"
    ),
    "q_stream_tumbling_hourly": "streaming (micro-batch plans)",
    "q_stream_sessionize": "streaming (micro-batch plans)",
    "q_stream_running_totals": "streaming (stateful micro-batch plans)",
    "q_stream_join": "streaming (stream-stream interval join micro-batches)",
    "q_stream_left_join": (
        "streaming (stream-stream LEFT OUTER interval join micro-batches; "
        "oracle pins the watermark-eviction cutoff)"
    ),
    "q_stream_dedup": "streaming (watermarked dedup micro-batches)",
    "q_stream_anomaly": (
        "streaming hourly counts (micro-batch plans) + batch z-score "
        "join against broadcast baseline stats"
    ),
    "q_emb_pca_power": (
        "one corpus pass to a 64×64 integer scatter matrix, then a "
        "bounded driver-side power iteration; returned frame is the "
        "64-row literal loading vector"
    ),
    "q_ev_bursts": (
        "one distributed hourly aggregate, then a bounded driver-side "
        "2-state integer Viterbi over the <=n-hour series; returned frame "
        "is the literal burst-interval table (recursive-CTE oracle twin)"
    ),
    "q_ev_markov_attribution": (
        "window-derived edge counts reduced to a ≤6×6 matrix, then a "
        "bounded driver-side integer power iteration; returned frame is "
        "the 4-row literal result"
    ),
    "q_doc_dup_clusters": "iterative (per-round join+agg, see operators/cc.py)",
    "q_mm_phash_neardup": "iterative (banded-Hamming edges -> CC rounds, see operators/cc.py)",
    "q_doc_canonical": "iterative (CC labels + quality argmax, see operators/cc.py)",
    "q_doc_leakage_split": "iterative (CC labels feed the group-aware split, see operators/cc.py)",
    "q_emb_cluster_agreement": (
        "8-centroid broadcast assignment cross joins (IVF + kmeans "
        "shapes) + single-row contingency-sum cross joins"
    ),
    "q_emb_kcenter": (
        "iterative (K-1 farthest-first rounds: broadcast one new center, "
        "running-min localCheckpoint per round, single-row argmax "
        "collect; returned frame is the K-row plan)"
    ),
    "q_emb_mmr": (
        "imperative (bounded driver-side greedy over the |Q|*POOL "
        "candidate/sim pools, q_emb_shard_plan precedent; corpus touched "
        "once by the knn-shape candidate scoring)"
    ),
    "q_esvc_replay": "event-log orchestration (many fingerprint jobs)",
    "q_esvc_merge": "event-log orchestration (many fingerprint jobs)",
    "q_esvc_editor": "event-log orchestration (many fingerprint jobs)",
    "q_emb_shard_plan": (
        "distributed IVF cell-sizing aggregate, then LPT greedy over the "
        "K-row cell table on the driver (bounded collect, cc.py policy); "
        "returned frame is the K-row plan (LocalTableScan)"
    ),
    "q_esvc_editor_large": (
        "event-log orchestration over the DISTRIBUTED SparkExEngine "
        "(4 persisted memo states + persist-free transient fingerprints; renumber is "
        "partition-parallel above 1M rows — spark_engine._global_index); "
        "returned frame is the checkpointed final state"
    ),
    "q_stream_emb_index": (
        "streamed IVF-index maintenance (foreachBatch add into the "
        "cell-partitioned store, redelivery-proof); returned frame is "
        "the checkpointed per-cell inventory"
    ),
    "q_emb_ivf_split": (
        "split_cell maintenance proof: build store, split hottest cell, "
        "search twice (pre-split vs old-codebook+probe-map) and exceptAll "
        "them; returned frame is the checkpointed post-split top-k with "
        "audit constants"
    ),
    "q_emb_ivf_merge": (
        "merge_cells maintenance proof: build store, merge the two "
        "coldest cells, exceptAll exhaustive-probe searches pre/post "
        "(corpus preservation), then serve at normal nprobe from the "
        "merged codebook; returned frame is the checkpointed post-merge "
        "top-k with audit constants"
    ),
    "q_emb_ivfpq_store": (
        "persisted IVF-PQ serving proof: build the store with a codes "
        "column + pq codebook, run search_pq (ADC over codes only, "
        "exact re-rank of topk*rerank) and the exact search over the "
        "same probes, join for per-query recall; returned frame is the "
        "checkpointed ADC top-k with recall audit"
    ),
    "q_stream_ingest_log": (
        "streaming foreachBatch parquet append run twice (redelivery "
        "proof); returned frame is the checkpointed final aggregate"
    ),
    "q_stream_event_log": (
        "streaming foreachBatch event-log loop run twice (redelivery "
        "proof): content-addressed MERGE append + per-batch append_head "
        "and >100-head compaction; returned frame is the checkpointed "
        "per-graph-key log/head aggregate"
    ),
    "q_esvc_merge_large": (
        "try_merge orchestration over the DISTRIBUTED SparkExEngine "
        "(hard-dep chain re-discovery + independence proof, each "
        "commutation check a fingerprint agg, under scoped confs); "
        "returned frame is the checkpointed merged state"
    ),
}

# Size-gated two-phase plans (round 8): these queries rank/scan a
# corpus-proportional frame through core.spark_engine's rank/prefix
# helpers (or relational._ordered_runs), which switch on a
# parquet-metadata row-count bound — at or below TWO_PHASE_MIN_ROWS
# (1<<20, measured crossover: scripts/ab_offset_path.py --helpers) the
# plan is ONE small window (the 1p exchange the profile shows at
# sf0.001 — bounded BY THE GATE, never corpus-proportional), above it
# the two-phase partition-parallel checkpoint plan r7 shipped
# (differentially proven identical in tests/test_spark_core.py).
_SIZE_GATED = {
    "q_ev_rfm": "3 global ranks, size-gated (two-phase above 1<<20 rows)",
    "q_window_deciles": "global rank + integer NTILE(10), size-gated",
    "q_ev_watermark_plan": "arrival running max, size-gated",
    "q_histogram_selectivity": "global rank boundary picks, size-gated",
    "q_encoding_advisor": "6 run counts (_ordered_runs), size-gated",
    "q_ev_mad_outliers": "2 grouped ranks (positional medians), size-gated",
    "q_doc_pack": "per-lang prefix token sum, size-gated",
    "q_doc_neyman_sample": "per-lang draw rank, size-gated",
    "q_doc_ccnet_buckets": "per-lang fluency rank + NTILE(3), size-gated",
    "q_zonemap_skipping": "per-layout chunk rank, size-gated (max-group bound)",
    "q_zorder_layout": "per-layout chunk rank, size-gated (max-group bound)",
    "q_doc_shuffle_shards": "per-shard position rank, size-gated (Chernoff max-group bound: largest mod-8 hash shard ~ n/8)",
}

# NLJs that are by-construction safe: scalar subquery or tiny broadcast side
_NLJ_OK = {
    "q_ev_rfm": "single-row n_users cross join (max rank)",
    "q_window_deciles": "single-row n cross join (max rank)",
    "q_emb_knn_cosine": "20-row query side broadcast",
    "q_emb_hard_negatives": "20-row anchor side broadcast (knn shape)",
    "q_emb_neardup_cosine": "bounded-input-only exact baseline (hard gate _NEARDUP_MAX_VECS=100k, fail-fast past it)",
    "q_emb_ivf_knn": "8-centroid broadcast assignment",
    "q_rag_retrieval": "centroid assignment (inherited from IVF)",
    "q_emb_ann_recall": "inherits knn + IVF sides",
    "q_ev_funnel": "single-row aggregate cross joins",
    "q_emb_kmeans": "8-centroid broadcast assignment cross joins",
    "q_ev_pagerank": "single-row node-count cross join per iteration",
    "q_doc_lm_score": "single-row vocabulary-size cross join",
    "q_ev_bloom": "single-row filter-words cross join",
    "q_doc_negatives": "single-row corpus-count cross join",
    "q11_value_concentration": "single-row threshold subquery",
    "q22_dormant_customers": "single-row avg-balance subquery",
    "q_doc_bpe_merges": "single-row top-pair broadcast per merge round",
    "q_ev_resample": "single-row hour-bounds + tiny event-type grid cross join",
    "q_ev_lift": "single-row basket-count cross join",
    "q_doc_bpe_encode": "single-row top-pair broadcast per merge round (bpe_merges shape)",
    "q_ev_kmv_windows": "single-row max-day bound cross joins",
    "q_fuzzy_match": "broadcast dirty-probe batch vs streamed dimension (ER shape)",
    "q_emb_pq_search": "20-row query side broadcast (knn shape, exact-recall audit side)",
    "q_ev_audience_overlap": "5-row event-type pair lattice cross join",
    "q_ev_changepoints": "single-row hour-bounds cross join (inherited from resample)",
    "q_doc_dsir": "single-row feature-totals cross join",
    "q_doc_bm25": "single-row corpus-stats cross join; 20-row query-term broadcast",
    "q_emb_binary_hamming": "20-row query side broadcast (knn shape, incl. exact audit side)",
    "q_doc_ccnet_buckets": "single-row vocabulary-size cross join (lm_score shape)",
    "q_doc_domain_reweight": "single-row vocab/totals/normalizer cross joins",
    "q_ev_forecast": "single-row hour-bounds + hmax cross joins (resample shape)",
    "q_emb_semdedup": "8-centroid broadcast assignment cross join (kmeans shape)",
    "q_emb_cluster_sample": "8-centroid broadcast assignment cross join (IVF shape)",
    "q_ev_incremental_agg": "single-row cutoff-day cross joins (base/delta split)",
    "q_doc_dup_transitivity": "single-row edge/wedge/triangle aggregate cross joins",
    "q_doc_signal_corr": "single-row vocabulary-size cross join (lm_score shape)",
    "q_dedup_method_eval": "single-row truth-count cross join",
    "q_doc_jackknife": "single-row totals/mbar/se cross joins over the |sources|-row table",
    "q_ev_key_skew": "single-row slot-stats x key-stats cross join per candidate key",
    "q_emb_recall_curve": "20-row query broadcast + 8-centroid assignment (knn + IVF shapes)",
    "q_ev_psi_drift": "single-row timeline-midpoint cross join",
    "q_ev_survival": (
        "prefix self-join (t' ≤ t) over the ≤720-row hour grid, "
        "broadcast probe side"
    ),
    "q_dq_checks": "single-row orders-total cross join (n_rows patch)",
    "q_ev_ab_test": "single-row arm-A x arm-B cross join (2-row reduction)",
    "q_ev_power_analysis": "single-row arm-A x arm-B cross join (ab_test shape)",
    "q_histogram_selectivity": (
        "single-row n/span + 32-bucket x 8-predicate lattice cross joins; "
        "truth = 8-row broadcast range join against the scan"
    ),
    "q_mm_audio_match": (
        "3-row delta-lattice landmark fan-out + tiny broadcast "
        "query-landmark join (fingerprints shuffle, payloads never)"
    ),
    "q_doc_langid_eval": "single-row accuracy-totals cross join",
    "q_benford_audit": (
        "single-row total + single-row chi2-fold cross joins over the "
        "9-digit histogram"
    ),
    "q_zorder_layout": (
        "single-row span + bounded predicate-lattice broadcast overlap "
        "join vs the 720 zone rows (zonemap shape) + tiny audit joins"
    ),
    "q_ev_bootstrap_ci": (
        "32-row replicate lattice map-side cross join + single-row "
        "ci_lo/ci_hi order-statistic cross joins"
    ),
    "q_ev_seasonality": "single-row (n, s) totals cross join over the 24-row profile",
    "q_emb_db_index": "single-row overall-DB-index cross join over the K-label table",
    "q_doc_threshold_sweep": "single-row corpus-totals cross join over the <=9-bin cumulative",
    "q_doc_textrank": (
        "single-row node-count cross join per rank iteration "
        "(pagerank shape; loop tables are vocabulary-sized)"
    ),
    "q_emb_label_consistency": "40-row anchor side broadcast (knn shape)",
    "q_emb_ivf_balance": (
        "8-centroid broadcast assignment cross join (IVF shape) + "
        "single-row totals cross join over the K-cell table"
    ),
    "q_ev_k_anonymity": "single-row totals cross join over the 4-band histogram",
    "q_ev_l_diversity": "single-row totals cross join over the 5-band histogram",
    "q_emb_ivfpq_search": (
        "8-centroid broadcast assignment (IVF shape), 20-row query "
        "broadcast on the exact-recall audit arm (knn shape), single-row "
        "corpus-count cross join for the scan fraction"
    ),
    "q_emb_filtered_ann": (
        "20-row query broadcast + 8-centroid assignment (knn + IVF "
        "shapes) on both the exact-filtered and post-filter arms"
    ),
    "q_ev_acf": (
        "single-row (n, s) totals + 2-row lag-lattice cross joins over "
        "the bounded hour grid"
    ),
    "q_doc_heaps": (
        "single-row doc-count + 8-row checkpoint-lattice broadcast "
        "inequality join against the TOKEN table; single-row fit cross join"
    ),
    "q_bloom_join_filter": (
        "single-row broadcast filter words + single-row dim-count "
        "cross joins (runtime-filter shape)"
    ),
    "q_doc_rrf_fusion": (
        "10-row query side broadcast on the semantic ranking (knn shape)"
    ),
    "q_zonemap_skipping": (
        "~85-row broadcast predicate side vs 720 zone rows (overlap "
        "join) + single-row n_preds cross join"
    ),
}


def main() -> None:
    from esvc_spark.plans import plan_stats
    from esvc_spark.queries import all_queries
    from esvc_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    lines = [
        "# PLANS — physical-plan profile of the query surface",
        "",
        "Generated by `scripts/plan_audit.py` at sf0.001 (plan shape is",
        "sf-independent). `sh` = shuffle exchanges, `1p` = SinglePartition",
        "exchanges (whole input through ONE task — must only ever sit over",
        "BOUNDED frames: value histograms, top-k survivors, single-row",
        "reductions; round 7 removed the last corpus-proportional ones,",
        "and round 8's size-gated rank helpers re-admit a 1p window ONLY",
        "under a metadata-proven row bound — see _SIZE_GATED notes),",
        "`bhj`/`smj`/`nlj` = broadcast-hash / sort-merge / nested-loop",
        "joins, `pushed` = # predicates reaching a parquet scan. Every",
        "`nlj` is annotated — unannotated nested loops are treated as",
        "regressions by tests/test_plans.py's contract checks.",
        "",
        "| query | sh | 1p | bhj | smj | nlj | pushed | note |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, fn in all_queries().items():
        if name in _IMPERATIVE:
            lines.append(
                f"| {name} | — | — | — | — | — | — | {_IMPERATIVE[name]} |"
            )
            continue
        st = plan_stats(fn(spark, sf))
        nlj = st.get("nested_loop_joins", 0)
        note = _NLJ_OK.get(name, "") if nlj else ""
        if nlj and not note:
            note = "UNEXPECTED NESTED LOOP"
        if name in _SIZE_GATED:
            note = "; ".join(filter(None, [note, _SIZE_GATED[name]]))
        lines.append(
            f"| {name} | {st['shuffles']} | {st.get('single_partition', 0)} "
            f"| {st.get('broadcast_hash_joins', 0)} "
            f"| {st.get('sort_merge_joins', 0)} | {nlj} "
            f"| {len(st.get('pushed_filters', []))} | {note} |"
        )
        spark.catalog.clearCache()

    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    bad = [ln for ln in lines if "UNEXPECTED" in ln]
    n_rows = sum(
        1 for ln in lines
        if ln.startswith("| q_") or re.match(r"\| q\d", ln)
    )
    print(f"wrote {out} ({n_rows} queries), unexpected NLJs: {len(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
