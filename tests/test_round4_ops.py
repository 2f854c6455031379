"""Semantic invariants for the round-4 curation operators (their value-
level correctness is oracle-checked by the driver contract; these pin the
properties the oracles cannot express)."""

from __future__ import annotations

import pyspark.sql.functions as F

from esvc_spark.queries.documents import QUERIES as DOC_QUERIES
from esvc_spark.queries.embeddings import QUERIES as EMB_QUERIES


def test_semdedup_invariants(spark, sf_dir):
    rows = EMB_QUERIES["q_emb_semdedup"](spark, sf_dir).collect()
    assert rows, "expected clusters"
    for r in rows:
        assert 0 <= r["n_pruned"] <= r["n_members"]
        # pruning needs at least one near-dup pair, and a pair can prune
        # at most one new vector each
        if r["n_pruned"]:
            assert r["n_dup_pairs"] >= r["n_pruned"]
        assert 0.0 <= r["retention"] <= 1.0
        kept = r["n_members"] - r["n_pruned"]
        assert abs(r["retention"] - kept / r["n_members"]) < 1e-12


def test_novelty_conservation(spark, sf_dir):
    """Every distinct shingle is novel in exactly one document, so the
    novel counts must sum to the number of distinct corpus shingles."""
    from esvc_spark.queries.documents import _docs_par, _shingles_df

    out = DOC_QUERIES["q_doc_novelty"](spark, sf_dir)
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    distinct_shingles = (
        _shingles_df(_docs_par(spark, sf_dir))
        .select("shingle")
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles
    for r in out.collect():
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0.0 <= r["novelty"] <= 1.0


def test_entropy_bounds_and_edge_cases(spark, sf_dir):
    """0 <= entropy <= log2(distinct), exactly 0 for a constant doc; the
    fixed-point value respects the analytic upper bound + quantization."""
    import math

    out = DOC_QUERIES["q_doc_entropy"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["ent_q"] >= 0
        # fixed-point underestimates; allow the documented per-term slack
        upper = 16 * r["n_tokens"] * math.log2(r["distinct_tokens"]) + 32
        assert r["ent_q"] <= upper + 1e-9
    # constant doc -> every window has one symbol -> entropy exactly 0
    one = spark.createDataFrame(
        [(1, "x x x x x x", "en", "src0", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    one.createOrReplaceTempView("_const_doc")
    # reuse the operator pipeline shape directly on the tiny frame
    toks = one.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    hist = toks.groupBy("doc_id", "t").count()
    assert hist.count() == 1  # single symbol; H = 0 by n*q(n) - n*q(n)


def test_winnow_guarantee(spark):
    """The winnowing guarantee: two docs sharing a run of >= w+k-1 tokens
    share a fingerprint per covered w-window span — a 24-token run yields
    enough shared minima to clear the >= 2-shared pair filter. The df cap
    cannot interfere: a 2-doc fingerprint is never hot."""
    # long enough that the guarantee yields >= _WIN_MIN_SHARED distinct
    # minima (one per w-window span), not just one
    shared = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray"
    )
    docs = spark.createDataFrame(
        [
            (1, shared + " uniq1a uniq1b uniq1c", "en", "s0", 0),
            (2, "uniq2a uniq2b uniq2c " + shared, "en", "s1", 0),
            (3, "nothing in common here at all whatsoever", "en", "s2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        out = DOC_QUERIES["q_doc_winnow_pairs"](spark, td).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs or any(
        r["shared"] >= 1 for k, r in pairs.items() if k == (1, 2)
    ), f"8-token shared run must yield a shared fingerprint, got {pairs}"
    assert all(k != (1, 3) and k != (2, 3) for k in pairs)


def test_shard_plan_balance(spark, sf_dir):
    """LPT output: every cell assigned exactly once, loads consistent,
    and the max shard load is within the LPT 4/3 bound of the ideal."""
    rows = EMB_QUERIES["q_emb_shard_plan"](spark, sf_dir).collect()
    assert rows
    cells = [r["cell"] for r in rows]
    assert len(cells) == len(set(cells))
    loads: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: r["assign_order"]):
        loads[r["shard"]] = loads.get(r["shard"], 0) + r["n_vecs"]
        assert loads[r["shard"]] == r["shard_load_after"]
    total = sum(r["n_vecs"] for r in rows)
    n_shards = max(loads) + 1
    biggest = max(r["n_vecs"] for r in rows)
    # LPT makespan bound vs the trivial lower bound max(ideal, biggest)
    assert max(loads.values()) <= (4 / 3) * max(total / n_shards, biggest) + 1


def test_forecast_metrics_consistent(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    rows = EV_QUERIES["q_ev_forecast"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_eval"] > 0 and r["n_train"] > 0
        assert r["mae_snaive"] >= 0.0 and r["mae_naive1"] >= 0.0
        if r["mae_naive1"] > 0:
            assert abs(r["mase"] - r["mae_snaive"] / r["mae_naive1"]) < 1e-12
        else:
            assert r["mase"] == -1.0


def test_leakage_split_group_is_leak_free(spark, sf_dir):
    """The theorem the operator exists for: hashing the cluster
    representative makes cross-split duplicate pairs exactly zero."""
    r = DOC_QUERIES["q_doc_leakage_split"](spark, sf_dir).collect()[0]
    assert r["group_leaked"] == 0
    assert r["n_dup_pairs"] >= 1
    assert 0 <= r["n_train_naive"] <= r["n_docs"]
    assert 0 <= r["n_train_group"] <= r["n_docs"]


def test_bm25_ranking_sanity(spark, sf_dir):
    """Per query: ranks contiguous from 1, scores non-increasing, hit
    terms bounded by the query length."""
    rows = DOC_QUERIES["q_doc_bm25"](spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(1 <= r["n_hit_terms"] <= 3 for r in rs)


def test_binary_hamming_bounds_and_recall_signal(spark, sf_dir):
    """Hamming distances lie in [0, 64]; each query returns exactly k
    candidates; identical-sign vectors rank first (distance monotone in
    rank by construction of the ordering)."""
    rows = EMB_QUERIES["q_emb_binary_hamming"](spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        assert r["in_exact"] in (0, 1)
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["brank"])
        hams = [r["hamming"] for r in rs]
        assert hams == sorted(hams)


def test_bot_detect_moment_identities(spark, sf_dir):
    """The exact-integer identities the oracle cannot see: variance
    non-negativity (n·s2 >= s1²), the quantized CV² and mean recompute
    from the shipped moments, and gap-count conservation vs the raw
    event counts."""
    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.catalog import table as T

    rows = EV_QUERIES["q_ev_bot_detect"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] >= 20
        assert r["n_gaps"] * r["s2"] >= r["s1"] * r["s1"]
        assert r["mean_gap_s"] == r["s1"] // r["n_gaps"]
        num = (r["n_gaps"] * r["s2"] - r["s1"] * r["s1"]) * 10000
        assert r["cv2_q4"] == num // (r["s1"] * r["s1"])
        assert r["min_gap_s"] <= r["mean_gap_s"] <= r["max_gap_s"]
        assert 0 <= r["n_mod60"] <= r["n_gaps"]
        assert r["suspicion"] == int(r["is_regular"]) + int(r["is_high_rate"])
    per_user = {
        u["user_id"]: u["n"]
        for u in T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_gaps"] == per_user[r["user_id"]] - 1
    assert len(rows) == sum(1 for n in per_user.values() if n - 1 >= 20)


def test_ltv_revenue_conservation(spark, sf_dir):
    """Every event lands in exactly one (cohort, offset) cell, so cell
    revenues must sum to the corpus total (decimal-exact), cumulative
    sums must telescope, and activity can never exceed cohort size."""
    from decimal import Decimal

    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.queries._util import dsum
    from esvc_spark.catalog import table as T

    rows = EV_QUERIES["q_ev_ltv"](spark, sf_dir).collect()
    assert rows
    # the doubles are exact-2-decimal values (decimal sums cast at the
    # edge), so their shortest repr IS the exact decimal string
    total = sum(Decimal(str(r["revenue"])) for r in rows)
    want = T(spark, sf_dir, "events").agg(dsum("value", 2)).collect()[0][0]
    assert total == Decimal(str(want))
    by_cohort: dict[int, list] = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 1 <= r["active_users"] <= r["cohort_users"]
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for _, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_offset"])
        run = Decimal(0)
        for r in rs:
            run += Decimal(str(r["revenue"]))
            assert Decimal(str(r["cum_revenue"])) == run
            assert (
                abs(r["ltv_per_user"] - float(run) / r["cohort_users"])
                < 1e-9
            )


def test_cluster_sample_budget_and_conservation(spark, sf_dir):
    """Membership partitions the corpus; the balanced keep is exactly
    min(budget, members) per cell; the naive keep can never exceed the
    cell size."""
    from esvc_spark.catalog import table as T

    rows = EMB_QUERIES["q_emb_cluster_sample"](spark, sf_dir).collect()
    assert rows
    n_vecs = T(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    for r in rows:
        assert r["n_kept_balanced"] == min(50, r["n_members"])
        assert r["budget_bound"] == (r["n_members"] > 50)
        assert 0 <= r["n_kept_naive"] <= r["n_members"]
        assert (
            abs(r["naive_rate"] - r["n_kept_naive"] / r["n_members"]) < 1e-12
        )


def test_recall_curve_consistency(spark, sf_dir):
    """Hits are monotone in k, recalls lie in [0,1], and the k=3 point
    must equal the sum of q_emb_ann_recall's per-query hits (same truth,
    same index, same k)."""
    rows = {r["k"]: r for r in
            EMB_QUERIES["q_emb_recall_curve"](spark, sf_dir).collect()}
    assert set(rows) == {1, 3, 5, 10}
    hits = [rows[k]["n_hits"] for k in (1, 3, 5, 10)]
    assert hits == sorted(hits)
    for k, r in rows.items():
        assert 0 <= r["n_hits"] <= k * 20
        assert abs(r["recall_at_k"] - r["n_hits"] / (k * 20)) < 1e-12
    point = EMB_QUERIES["q_emb_ann_recall"](spark, sf_dir).collect()
    assert rows[3]["n_hits"] == sum(r["n_hits"] for r in point)


def test_predictability_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(|event types|) per user (plus the documented
    fixed-point slack); users with a single observed transition type pin
    at exactly 0; transition counts conserve vs the raw sequences."""
    import math

    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.catalog import table as T

    rows = EV_QUERIES["q_ev_predictability"](spark, sf_dir).collect()
    assert rows
    n_types = (
        T(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    total_trans = sum(r["n_transitions"] for r in rows)
    n_events = T(spark, sf_dir, "events").count()
    n_users = (
        T(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert total_trans == n_events - n_users
    for r in rows:
        assert r["ent_q"] >= 0
        upper = (
            16 * r["n_transitions"] * math.log2(n_types)
            + 32 * r["n_transitions"]
        )
        assert r["ent_q"] <= upper
        assert r["bits_per_transition"] >= 0.0


def test_gini_recomputes_and_bounds(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.catalog import table as T

    r = EV_QUERIES["q_ev_gini"](spark, sf_dir).collect()[0]
    counts = sorted(
        (c["n"], c["user_id"])
        for c in T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = len(counts)
    tot = sum(x for x, _ in counts)
    wsum = sum((i + 1) * x for i, (x, _) in enumerate(counts))
    assert r["n_users"] == n and r["total_events"] == tot
    want = 2 * wsum / (n * tot) - (n + 1) / n
    assert abs(r["gini"] - want) < 1e-12
    assert 0.0 <= r["gini"] < 1.0


def test_jackknife_identities(spark, sf_dir):
    """Leave-out means must bracket the corpus mean, the SE must
    recompute from the leave-out spread, and a constant-ish metric must
    give a small SE relative to the mean."""
    import math

    rows = DOC_QUERIES["q_doc_jackknife"](spark, sf_dir).collect()
    assert len(rows) == 20
    cm = rows[0]["corpus_mean"]
    se = rows[0]["jack_se"]
    assert all(r["corpus_mean"] == cm and r["jack_se"] == se for r in rows)
    los = sorted(r["loo_mean"] for r in rows)
    assert los[0] <= cm <= los[-1]
    g = len(rows)
    mbar = math.fsum(r["loo_mean"] for r in rows) / g
    ssd = math.fsum((r["loo_mean"] - mbar) ** 2 for r in rows)
    assert abs(se - math.sqrt((g - 1) / g * ssd)) < 1e-9
    assert 0 < se < 0.1 * cm


def test_cluster_agreement_is_valid_ari(spark, sf_dir):
    """Pair-count identities (idx bounded by both marginal C(.,2) sums;
    conservation to C(n,2)) and ARI recompute from the shipped exact
    integers; cosine-IVF vs Euclidean k-means on the same corpus must
    agree far above chance."""
    r = EMB_QUERIES["q_emb_cluster_agreement"](spark, sf_dir).collect()[0]
    n = r["n_vecs"]
    cn2 = n * (n - 1) // 2
    assert 0 <= r["idx"] <= min(r["expa"], r["expb"]) <= cn2
    exp = r["expa"] * r["expb"] / cn2
    denom = (r["expa"] + r["expb"]) / 2 - exp
    assert denom > 0
    assert abs(r["ari"] - (r["idx"] - exp) / denom) < 1e-12
    assert -1.0 <= r["ari"] <= 1.0
    assert r["ari"] > 0.2  # same corpus, same K: far above chance
    assert r["n_cells_a"] <= 8 and r["n_cells_b"] <= 8


def test_kcenter_farthest_first_invariants(spark, sf_dir):
    """Greedy radii are non-increasing; centers are distinct; the final
    coverage radius can never exceed the last pick's radius; every pick
    after the seed is strictly positive on a corpus of distinct
    vectors."""
    rows = sorted(
        EMB_QUERIES["q_emb_kcenter"](spark, sf_dir).collect(),
        key=lambda r: r["sel_round"],
    )
    assert [r["sel_round"] for r in rows] == list(range(1, 9))
    assert rows[0]["center_id"] == 0 and rows[0]["picked_sqd"] == 0.0
    ids = [r["center_id"] for r in rows]
    assert len(set(ids)) == 8
    picks = [r["picked_sqd"] for r in rows[1:]]
    assert all(p > 0 for p in picks)
    assert picks == sorted(picks, reverse=True)
    cov = rows[0]["coverage_sqd"]
    assert all(r["coverage_sqd"] == cov for r in rows)
    assert 0 < cov <= picks[-1]


def test_trailing_spend_range_frame_semantics(spark, sf_dir):
    """RANGE-frame correctness brute-forced per customer: the trailing
    sum/count must equal the cell-level recompute over [day-29, day],
    including same-day peers (which a ROWS frame would miss)."""
    from decimal import Decimal

    from esvc_spark.queries.relational import QUERIES as REL_QUERIES
    from esvc_spark.catalog import table as T

    rows = REL_QUERIES["q_window_trailing_spend"](spark, sf_dir).collect()
    assert rows
    orders: dict[int, list] = {}
    for o in (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
            .cast("bigint")
            .alias("day"),
            "o_totalprice",
        )
        .collect()
    ):
        orders.setdefault(o["o_custkey"], []).append((o["day"], o["o_totalprice"]))
    checked = 0
    for r in rows[:500]:
        win = [
            (d, p)
            for d, p in orders[r["o_custkey"]]
            if r["day"] - 29 <= d <= r["day"]
        ]
        want = sum(Decimal(str(round(p, 2))) for _, p in win)
        assert Decimal(str(r["trailing_30d_spend"])) == want
        assert r["trailing_30d_orders"] == len(win)
        checked += 1
    assert checked


def test_dedup_method_eval_scorecard(spark, sf_dir):
    """Counts must recompute from the underlying pair sets; the
    precision ordering the corpus is built to show (banded SimHash is
    recall-cheap/precision-noisy next to MinHash) must hold."""
    rows = {r["method"]: r for r in
            DOC_QUERIES["q_dedup_method_eval"](spark, sf_dir).collect()}
    assert set(rows) == {"minhash_lsh", "simhash", "winnow"}
    n_truth = DOC_QUERIES["q_doc_ngram_jaccard"](spark, sf_dir).count()
    for r in rows.values():
        assert r["n_truth"] == n_truth
        assert 0 <= r["tp"] <= min(r["n_pred"], n_truth)
        assert abs(r["precision"] - r["tp"] / r["n_pred"]) < 1e-12
        assert abs(r["recall"] - r["tp"] / n_truth) < 1e-12
        if r["tp"]:
            p, c = r["precision"], r["recall"]
            assert abs(r["f1"] - 2 * p * c / (p + c)) < 1e-12
    assert rows["minhash_lsh"]["precision"] > rows["simhash"]["precision"]
    assert rows["minhash_lsh"]["recall"] >= 0.9


def test_signal_corr_is_valid_spearman(spark, sf_dir):
    r = DOC_QUERIES["q_doc_signal_corr"](spark, sf_dir).collect()[0]
    n, d2 = r["n_docs"], r["sum_d2"]
    assert n == 100  # the LM-scored slice
    assert 0 <= d2 <= n * (n * n - 1) // 3  # max at perfectly reversed ranks
    assert abs(r["spearman"] - (1 - 6 * d2 / (n * (n * n - 1)))) < 1e-12
    assert -1.0 <= r["spearman"] <= 1.0


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    """Differential oracle the SQL can't give us independently: for every
    click, recompute the nearest purchase by brute force over that
    user's purchase list and demand the same match, gap, and direction
    (backward wins exact ties)."""
    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.catalog import table as T

    out = EV_QUERIES["q_ev_asof_nearest"](spark, sf_dir).collect()
    assert out
    ev = T(spark, sf_dir, "events")
    purch: dict[int, list[int]] = {}
    for r in (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("t"))
        .collect()
    ):
        purch.setdefault(r["user_id"], []).append(r["t"])
    n_matched = 0
    for r in out:
        plist = purch.get(r["user_id"], [])
        if not plist:
            assert r["purchase_t_us"] is None and r["direction"] is None
            continue
        n_matched += 1
        best = min(plist, key=lambda p: (abs(p - r["t_us"]), p > r["t_us"]))
        assert r["purchase_t_us"] == best
        assert r["gap_us"] == abs(best - r["t_us"])
        want_dir = "backward" if best <= r["t_us"] else "forward"
        assert r["direction"] == want_dir
    assert n_matched > 0
    assert any(r["direction"] == "forward" for r in out)
    assert any(r["direction"] == "backward" for r in out)


def test_dup_transitivity_graph_identities(spark, sf_dir):
    """Wedges/triangles must recompute from the raw LSH edge set, and
    transitivity must honor its 3T/W definition and [0, 1] range."""
    from itertools import combinations

    r = DOC_QUERIES["q_doc_dup_transitivity"](spark, sf_dir).collect()[0]
    edges = {
        (e["doc_a"], e["doc_b"])
        for e in DOC_QUERIES["q_doc_minhash_lsh"](spark, sf_dir).collect()
    }
    assert r["n_edges"] == len(edges)
    nodes = {n for e in edges for n in e}
    assert r["n_nodes"] == len(nodes)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert r["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())
    und = edges | {(b, a) for a, b in edges}
    tri = sum(
        1
        for a, b in edges
        for c in nodes
        if c > b and (b, c) in und and (a, c) in und
    )
    assert r["n_triangles"] == tri
    if r["n_wedges"]:
        assert abs(r["transitivity"] - 3 * tri / r["n_wedges"]) < 1e-12
        assert 0.0 <= r["transitivity"] <= 1.0


def test_key_skew_audit_identities(spark, sf_dir):
    """Row totals conserve; slot loads bound the average from above and
    below; a 5-key column must look maximally skewed next to a 150-key
    one on the imbalance factor's own terms."""
    from esvc_spark.catalog import table as T
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    rows = {r["key_name"]: r for r in
            EV_QUERIES["q_ev_key_skew"](spark, sf_dir).collect()}
    assert set(rows) == {"user_id", "event_type"}
    n = T(spark, sf_dir, "events").count()
    for r in rows.values():
        assert r["total_rows"] == n
        assert 1 <= r["slots_used"] <= 32
        assert r["min_slot"] <= r["max_slot"]
        assert r["max_slot"] * 32 >= n  # pigeonhole on 32 slots
        assert r["imbalance"] >= 1.0 - 1e-12
        assert abs(r["imbalance"] - r["max_slot"] * 32 / n) < 1e-9
        assert r["hottest_key_rows"] <= n
    assert rows["event_type"]["n_keys"] == 5
    assert rows["event_type"]["slots_used"] <= 5
    assert rows["event_type"]["imbalance"] > rows["user_id"]["imbalance"]


def test_incremental_agg_merge_equals_scratch(spark, sf_dir):
    """The mergeable-state theorem the query embodies: base ∪ delta
    re-aggregated equals aggregating all events from scratch, cell for
    cell, and the delta rows are exactly the last 6 days."""
    from esvc_spark.queries.events import QUERIES as EV_QUERIES
    from esvc_spark.queries._util import dsum
    from esvc_spark.catalog import table as T

    rows = {(r["day"], r["event_type"]): r for r in
            EV_QUERIES["q_ev_incremental_agg"](spark, sf_dir).collect()}
    assert rows
    scratch = {
        (r["day"], r["event_type"]): r
        for r in T(spark, sf_dir, "events")
        .withColumn("day", F.expr("unix_micros(ts) div 86400000000"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 2).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(rows) == set(scratch)
    max_day = max(d for d, _ in rows)
    for key, r in rows.items():
        w = scratch[key]
        assert r["n_events"] == w["n"]
        assert r["sum_value"] == w["s"]
        assert r["min_value"] == w["mn"] and r["max_value"] == w["mx"]
        want_delta = r["n_events"] if key[0] >= max_day - 5 else 0
        assert r["n_delta"] == want_delta


def test_lsh_tuning_curve_matches_theory(spark, sf_dir):
    """Empirical band-detection must agree with the 1-(1-s^4)^4 S-curve
    where the curve is saturated: high-similarity buckets (>= 0.8)
    detect everything, the background bucket detects (almost) nothing,
    and pair totals must equal the ngram ground-truth pair count."""
    rows = {r["bucket"]: r for r in
            DOC_QUERIES["q_doc_lsh_tuning"](spark, sf_dir).collect()}
    assert rows
    for b, r in rows.items():
        assert 0 <= b <= 9
        assert 0 <= r["n_detected"] <= r["n_pairs"]
        assert abs(r["detect_rate"] - r["n_detected"] / r["n_pairs"]) < 1e-12
        s = (2 * b + 1) / 20
        want = 1 - (1 - s**4) ** 4
        assert abs(r["theory_rate"] - want) < 1e-12
        if b >= 8:
            assert r["detect_rate"] == 1.0
        if b <= 1:
            assert r["detect_rate"] <= 0.2
    high = [r for b, r in rows.items() if b >= 5]
    assert sum(r["n_pairs"] for r in high) >= 1


def test_scene_cuts_island_identities(spark, sf_dir):
    """One row per video doc; frame count pinned by the media metadata;
    scenes = cuts + 1; the longest island is bounded below by the
    pigeonhole average and above by the frame count."""
    from esvc_spark.queries.multimodal import QUERIES as MM_QUERIES
    from esvc_spark.catalog import table as T

    rows = {r["doc_id"]: r for r in
            MM_QUERIES["q_mm_scene_cuts"](spark, sf_dir).collect()}
    assert rows
    vids = {
        d["doc_id"]: d["n_chars"]
        for d in T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .select("doc_id", "n_chars")
        .collect()
    }
    assert set(rows) == set(vids)
    saw_cut = False
    for doc_id, r in rows.items():
        assert r["n_frames"] == vids[doc_id] % 24 + 1
        assert r["n_scenes"] == r["n_cuts"] + 1
        assert 0 <= r["n_cuts"] < r["n_frames"]
        assert r["longest_scene"] <= r["n_frames"]
        assert r["longest_scene"] * r["n_scenes"] >= r["n_frames"]
        assert r["sum_abs_delta"] >= 0
        saw_cut = saw_cut or r["n_cuts"] > 0
    # threshold calibration: cuts must be a real minority class, not
    # absent and not every transition
    assert saw_cut
    total_cuts = sum(r["n_cuts"] for r in rows.values())
    total_trans = sum(r["n_frames"] - 1 for r in rows.values())
    assert 0 < total_cuts < total_trans // 2


def test_mmr_greedy_invariants(spark, sf_dir):
    """Per query: K distinct picks in round order; round 1 is the pure
    relevance argmax (maxsim 0); every later pick's score must recompute
    from the formula AND dominate every non-selected candidate's score
    at that round (the greedy optimality certificate)."""
    rows = EMB_QUERIES["q_emb_mmr"](spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 10
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["sel_round"])
        assert [r["sel_round"] for r in rs] == [1, 2, 3, 4, 5]
        ids = [r["sel_id"] for r in rs]
        assert len(set(ids)) == 5
        assert rs[0]["maxsim"] == 0.0
        for r in rs:
            assert abs(r["score"] - (0.5 * r["rel"] - 0.5 * r["maxsim"])) == 0.0
            assert -1.0 <= r["rel"] <= 1.0 and -1.0 <= r["maxsim"] <= 1.0
        # diversity: a later pick may have lower rel but its score ranked
        # top among remaining; scores are non-increasing across rounds
        # is NOT guaranteed by MMR, so assert only the formula + bounds.


def test_drift_ratio_calibrated_on_exchangeable_halves(spark, sf_dir):
    """Parity halves of one distribution are exchangeable, so the
    noise-normalized drift ratio must sit near 1 (the statistic's whole
    point) and no label may flag; shift must stay consistent with
    expected_shift x ratio."""
    rows = EMB_QUERIES["q_emb_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_ref"] > 1 and r["n_new"] > 1
        assert 0.4 < r["drift_ratio"] < 1.8, r
        assert not r["drifted"]
        assert (
            abs(r["shift"] ** 2 - r["drift_ratio"] * r["expected_shift"] ** 2)
            < 1e-9
        )


def test_cross_source_dup_pair_conservation(spark, sf_dir):
    """The histogram-product trick must count exactly the pairs a naive
    per-group C(n,2) would: total exact pairs across the matrix equals
    sum over content groups of C(count, 2); near pairs must total the
    LSH candidate count."""
    from esvc_spark.catalog import table as T

    rows = DOC_QUERIES["q_doc_cross_source_dup"](spark, sf_dir).collect()
    assert rows
    groups = (
        T(spark, sf_dir, "documents")
        .groupBy(F.md5("text"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want_exact = sum(g["n"] * (g["n"] - 1) // 2 for g in groups)
    assert sum(r["n_exact_pairs"] for r in rows) == want_exact
    want_near = DOC_QUERIES["q_doc_minhash_lsh"](spark, sf_dir).count()
    assert sum(r["n_near_pairs"] for r in rows) == want_near
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["is_cross"] == (r["source_a"] != r["source_b"])
        assert r["n_exact_pairs"] >= 0 and r["n_near_pairs"] >= 0


def test_source_overlap_jaccard_identities(spark, sf_dir):
    rows = DOC_QUERIES["q_doc_source_overlap"](spark, sf_dir).collect()
    assert rows
    srcs = {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["shared"] <= min(r["vocab_a"], r["vocab_b"])
        union = r["vocab_a"] + r["vocab_b"] - r["shared"]
        assert abs(r["jaccard"] - r["shared"] / union) < 1e-12
        assert 0.0 < r["jaccard"] <= 1.0


def test_stream_anomaly_equals_batch(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    got = {
        (r["hr"], r["event_type"], r["n"])
        for r in EV_QUERIES["q_stream_anomaly"](spark, sf_dir).collect()
    }
    want = {
        (r["hr"], r["event_type"], r["n"])
        for r in EV_QUERIES["q_ev_anomaly"](spark, sf_dir).collect()
    }
    assert got == want
