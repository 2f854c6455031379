"""Invariant tests for the training-pipeline operators added on top of the
dedup/similarity family (their value-level correctness is oracle-checked
via the driver contract; these pin the semantic invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from esvc_spark.queries.documents import (
    QUERIES as DOC_QUERIES,
)


def test_dup_clusters_invariants(spark, sf_dir):
    out = DOC_QUERIES["q_doc_dup_clusters"](spark, sf_dir).collect()
    assert out, "expected at least one duplicate cluster in the test corpus"
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        # representative is the minimum member and belongs to its cluster
        assert cid == ids[0]
        # every member carries the true cluster size
        assert all(m["cluster_size"] == len(members) for m in members)
        # exactly one keeper per cluster: the representative
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid
        # clusters are non-trivial (edges exist only between duplicates)
        assert len(members) >= 2


def test_sample_mixture_deterministic_and_stratified(spark, sf_dir):
    q = DOC_QUERIES["q_doc_sample_mixture"]
    a = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    assert a == b, "hash sampling must be run-to-run deterministic"
    rows = q(spark, sf_dir).collect()
    assert all(r["bucket"] < r["rate"] for r in rows)


def test_tfidf_top_terms_ranked(spark, sf_dir):
    rows = DOC_QUERIES["q_doc_tfidf_top"](spark, sf_dir).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, terms in per_doc.items():
        assert len(terms) <= 3
        ranked = sorted(terms, key=lambda r: r["rk"])
        scores = [r["score"] for r in ranked]
        assert scores == sorted(scores, reverse=True)


def test_kmv_estimate_close_to_exact(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    rows = EV_QUERIES["q_ev_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # KMV with k=64 has ~1/sqrt(62) ≈ 13% stddev; 50% is a loose
        # sanity bound that still catches a broken estimator
        assert abs(r["rel_err"]) < 0.5, (r["event_type"], r["rel_err"])


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from esvc_spark.queries.events import QUERIES as EV_QUERIES

    stream = EV_QUERIES["q_stream_tumbling_hourly"](spark, sf_dir)
    batch = (
        EV_QUERIES["q_ev_tumbling_hourly"](spark, sf_dir)
        .select("window_start", "event_type", "n_events", "sum_value")
    )
    assert stream.exceptAll(batch).isEmpty()
    assert batch.exceptAll(stream).isEmpty()


def test_connected_components_property(spark):
    """Spark min-label CC equals a pure-Python union-find on random edge
    lists (bounded sizes keep each case to a couple of Spark rounds)."""
    import random

    from esvc_spark.operators.cc import connected_components

    rng = random.Random(1234)
    for _ in range(5):
        n = rng.randint(2, 30)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(1, 40))
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: min(y for y in touched if find(y) == find(x)) for x in touched}

        df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
        got = {
            r["doc_id"]: r["label"]
            for r in connected_components(df).collect()
        }
        assert got == want
        # the distributed Pregel loop (bypassing the small-edge-list
        # union-find fast path) must produce the identical labels
        from esvc_spark.operators.cc import _connected_components, _scoped_shuffle_partitions

        with _scoped_shuffle_partitions(spark, 4):
            got_dist = {
                r["doc_id"]: r["label"]
                for r in _connected_components(df).collect()
            }
        assert got_dist == want


def test_connected_components_long_path(spark):
    """A path graph of diameter 60 through the DISTRIBUTED loop: the
    regression case for the round-3 lineage-explosion bug (each round's
    plan referenced the previous round's twice; without localCheckpoint
    the analyzer cost doubled per round and a diameter-16 graph took
    minutes). Must converge to one component labeled 0, and fast."""
    import time

    from esvc_spark.operators.cc import _connected_components, _scoped_shuffle_partitions

    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    t0 = time.perf_counter()
    with _scoped_shuffle_partitions(spark, 4):
        got = {r["doc_id"]: r["label"] for r in _connected_components(df).collect()}
    assert got == {i: 0 for i in range(61)}
    assert time.perf_counter() - t0 < 120  # was unbounded pre-fix


# ----------------------------------------------------- operator invariants
# Structural invariants of the newer pipeline operators — properties that
# must hold by construction, independent of the oracle value match.

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark):
    """Count-min estimates are upper bounds on the exact count (the
    sketch's defining one-sided error guarantee)."""
    from esvc_spark.queries.events import q_ev_cms_heavy

    rows = q_ev_cms_heavy(spark, SF).collect()
    assert rows, "probe set must be non-empty"
    for r in rows:
        assert r["est"] >= r["n_exact"]
        assert r["overcount"] == r["est"] - r["n_exact"]


def test_kmeans_update_never_increases_wcss(spark):
    """Lloyd monotonicity: re-assigning to the updated centroids cannot
    increase the summed squared distance (each step minimizes it)."""
    from pyspark.sql import functions as F

    from esvc_spark.queries.embeddings import _emb, _km_assign, _km_update

    e = _emb(spark, SF).select("vec_id", "emb")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("emb").alias("cemb")
    )
    a0 = _km_assign(e, cents).persist()
    wcss0 = a0.agg(F.sum("sqd")).collect()[0][0]
    a1 = _km_assign(e, _km_update(a0))
    wcss1 = a1.agg(F.sum("sqd")).collect()[0][0]
    assert wcss1 <= wcss0 + 1e-9


def test_pagerank_is_a_distribution(spark):
    """Ranks are positive and sum to 1 (damping mass conservation holds
    because every node in this graph has out-edges)."""
    from esvc_spark.queries.events import q_ev_pagerank

    rows = q_ev_pagerank(spark, SF).collect()
    assert rows
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    assert all(r["pagerank"] > 0 for r in rows)


def test_split_partitions_every_doc_exactly_once(spark):
    """Train/test split is a partition: per-lang doc counts add back up to
    the corpus, and both splits are non-empty overall."""
    from pyspark.sql import functions as F

    from esvc_spark.catalog import table as T
    from esvc_spark.queries.documents import q_doc_split

    split = q_doc_split(spark, SF).collect()
    per_lang = {}
    for r in split:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    want = {
        r["lang"]: r["n"]
        for r in T(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang == want
    assert {r["split"] for r in split} == {"train", "test"}


def test_pq_reconstruction_beats_random_code(spark):
    """The chosen PQ code's error is the subspace minimum: re-encoding
    with code 0 everywhere can only do worse or equal in aggregate."""
    from pyspark.sql import functions as F

    from esvc_spark.queries.embeddings import _km_sqdist, _pq_parts, _emb

    e = _emb(spark, SF).select("vec_id", "emb")
    parts = _pq_parts(e)
    book = _pq_parts(e.filter(F.col("vec_id") < 16)).select(
        F.col("vec_id").cast("int").alias("code"), "sub",
        F.col("part").alias("cpart"),
    )
    scored = parts.join(F.broadcast(book), "sub").select(
        "vec_id", "sub", "code",
        _km_sqdist(F.col("part"), F.col("cpart")).alias("sqe"),
    ).persist()
    best = (
        scored.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("sqe", "code")).alias("b"))
        .agg(F.sum("b.sqe"))
        .collect()[0][0]
    )
    fixed = scored.filter(F.col("code") == 0).agg(F.sum("sqe")).collect()[0][0]
    assert best <= fixed + 1e-9


def test_bloom_has_no_false_negatives(spark):
    """Bloom filters are one-sided: every member must test positive; the
    false-positive count stays under a loose multiple of the theoretical
    rate for k=3, m=1024."""
    from esvc_spark.queries.events import q_ev_bloom

    row = q_ev_bloom(spark, SF).collect()[0]
    assert row["n_false_negatives"] == 0
    n_negatives = row["n_probes"] - row["n_members"]
    assert n_negatives > 0, "probe set must contain true negatives"
    # theoretical FPR (1 - e^(-k n/m))^k; allow 4x for small-sample noise
    import math

    fpr = (1 - math.exp(-3 * row["n_members"] / 1024)) ** 3
    assert row["n_false_positives"] <= max(5, 4 * fpr * n_negatives)


def test_pack_partitions_every_doc(spark):
    """Sequence packing is a partition of the corpus: per-lang doc counts
    across bins sum to the corpus, and no bin overflows budget + one doc
    (concat-and-chunk never leaves a bin more than one doc over)."""
    from pyspark.sql import functions as F

    from esvc_spark.catalog import table as T
    from esvc_spark.queries.documents import _PACK_BUDGET, q_doc_pack

    bins = q_doc_pack(spark, SF).collect()
    per_lang = {}
    for r in bins:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    want = {
        r["lang"]: r["n"]
        for r in T(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang == want
    assert all(r["total_tokens"] > 0 for r in bins)


def test_dataset_card_rates_are_probabilities(spark):
    from esvc_spark.queries.documents import q_dataset_card

    rows = q_dataset_card(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["embed_coverage"] <= 1.0
        assert r["n_embedded"] <= r["n_docs"]


def test_audio_windows_cover_payload(spark):
    """Window sample counts per doc sum to the full payload length (the
    segmentation drops and duplicates nothing)."""
    from pyspark.sql import functions as F

    from esvc_spark.operators.multimodal import audio_windows, media_table

    media = media_table(spark, SF)
    win = audio_windows(media, win=32)
    got = {
        r["doc_id"]: r["total"]
        for r in win.groupBy("doc_id").agg(F.sum("n_samples").alias("total")).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in media.filter(F.col("meta.kind") == "audio")
        .select("doc_id", F.length("payload").alias("n"))
        .collect()
    }
    assert got == want


def test_bpe_merges_match_pure_python_reference(spark):
    """q_doc_bpe_merges equals a from-scratch Python BPE on the same
    corpus: same top pair, same count, per round (greedy left-to-right
    merge order, count-desc/pair-asc tiebreak)."""
    import re
    from collections import Counter

    import duckdb

    from esvc_spark.queries.documents import q_doc_bpe_merges

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    words = [w for t in texts for w in re.findall(r"\S+", t)]
    encoded = [list(w) for w in words]

    def top_pair(enc):
        c = Counter()
        for syms in enc:
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += 1
        # count desc, then pair-string asc on the wrapped form the query
        # sorts by ('>a<>b<' lexicographic == tuple lexicographic for
        # ASCII symbols)
        return min(c.items(), key=lambda kv: (-kv[1], kv[0]))

    def merge(enc, pair):
        a, b = pair
        out = []
        for syms in enc:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out.append(merged)
        return out

    want = []
    for _ in (1, 2):
        pair, cnt = top_pair(encoded)
        want.append((pair[0] + pair[1], cnt))
        encoded = merge(encoded, pair)

    got = sorted(
        (r["merge_rank"], r["merged"], r["pair_count"])
        for r in q_doc_bpe_merges(spark, SF).collect()
    )
    assert got == [(1, want[0][0], want[0][1]), (2, want[1][0], want[1][1])]


def test_attribution_shares_sum_to_one(spark):
    from pyspark.sql import functions as F

    from esvc_spark.queries.events import q_ev_attribution

    rows = q_ev_attribution(spark, SF)
    sums = (
        rows.groupBy("purchase_id")
        .agg(F.sum("credit_share").alias("s"))
        .collect()
    )
    assert sums  # the sf0.001 slice produces at least one attributed purchase
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9


def test_resample_grid_is_dense(spark):
    """Every hour between the corpus bounds appears exactly once per
    event type, and gap hours carry n_events = 0."""
    from pyspark.sql import functions as F

    from esvc_spark.queries.events import q_ev_resample

    out = q_ev_resample(spark, SF).persist()
    per_type = (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("ts_hour").alias("nd"),
            F.min("ts_hour").alias("lo"),
            F.max("ts_hour").alias("hi"),
        )
        .collect()
    )
    spans = {(r["lo"], r["hi"]) for r in per_type}
    assert len(spans) == 1  # same global grid for every type
    for r in per_type:
        hours = int((r["hi"] - r["lo"]).total_seconds() // 3600) + 1
        assert r["n"] == r["nd"] == hours
    assert out.filter(F.col("n_events") == 0).count() > 0
    out.unpersist()


def test_chunk_windows_tile_tokens(spark):
    """Chunks start every 48 tokens, each holds min(64, n - start)
    tokens, and the last chunk reaches the end of the doc."""
    from pyspark.sql import functions as F

    from esvc_spark.queries.documents import q_doc_chunk

    rows = q_doc_chunk(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    import duckdb

    n_tokens = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT doc_id, len(regexp_extract_all(text, '(\\S+)', 1)) "
            f"FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = n_tokens[doc_id]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c["chunk_idx"] * 48
            assert c["n_chunk_tokens"] == min(64, n - start)
        assert (len(chunks) - 1) * 48 + chunks[-1]["n_chunk_tokens"] == n


def test_dsir_fixed_point_log2_cross_engine_and_accuracy(spark):
    """The DSIR weight is a difference of two fixed-point log2 terms that
    must (a) agree bit-for-bit between the Spark and DuckDB dialects and
    (b) track 16*log2(num/den) within the piecewise-linear error bound
    (each qlog2 term underestimates by < 0.086 octave + 1 floor unit)."""
    import math

    import duckdb

    from esvc_spark.queries.documents import _DSIR_B, _dsir_weight_expr

    cases = []
    for tc in (0, 1, 7, 999, 123_456, 5_000_000):
        for rc in (tc, tc + 1, tc * 3 + 5, 9_999_999):
            cases.append((tc, rc, 2_000_000, 9_000_000))
    cases += [(0, 0, 1, 1), (1, 1, 1, 1), (42, 99, 123, 456)]

    vals = ", ".join(
        f"({tc}::BIGINT, {rc}::BIGINT, {t}::BIGINT, {r}::BIGINT)"
        for tc, rc, t, r in cases
    )
    duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT CAST({_dsir_weight_expr('duckdb')} AS BIGINT) "
            f"FROM (VALUES {vals}) t(tc, rc, t_total, r_total)"
        ).fetchall()
    ]
    sdf = spark.createDataFrame(
        cases, "tc long, rc long, t_total long, r_total long"
    ).selectExpr(f"CAST({_dsir_weight_expr('spark')} AS BIGINT) AS w")
    got = [r["w"] for r in sdf.collect()]
    assert got == duck, "Spark and DuckDB dialects diverged"

    for (tc, rc, t, r), w in zip(cases, duck):
        true = 16 * math.log2(((tc + 1) * (r + _DSIR_B)) / ((rc + 1) * (t + _DSIR_B)))
        assert abs(w - true) <= 3, (tc, rc, t, r, w, true)


def test_line_dedup_rebuilds_cleaned_text(spark, tmp_path):
    """Planted-boilerplate corpus: the shared 8-token block (segment 0 of
    docs 0 and 1) must be removed from BOTH docs and the cleaned text
    rebuilt in position order — clean_md5 must equal the md5 of the
    doc's unique remainder. Doc 2 (unique, ragged 11-token tail) must
    pass through untouched with its segments rejoined losslessly."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = " ".join(f"b{i}" for i in range(8))
    u0 = " ".join(f"u0x{i}" for i in range(8))
    u1 = " ".join(f"u1x{i}" for i in range(8))
    u2 = " ".join(f"u2x{i}" for i in range(11))
    texts = [f"{boiler} {u0}", f"{boiler} {u1}", u2]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["src0"] * 3,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r["doc_id"]: r
        for r in DOC_QUERIES["q_doc_line_dedup"](spark, str(tmp_path)).collect()
    }
    for did, clean in ((0, u0), (1, u1)):
        assert out[did]["n_segments"] == 2
        assert out[did]["n_dup_segments"] == 1
        assert out[did]["tokens_removed"] == 8
        assert out[did]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    assert out[2]["n_segments"] == 2  # 8 + ragged 3
    assert out[2]["n_dup_segments"] == 0
    assert out[2]["retained_frac"] == 1.0
    assert out[2]["clean_md5"] == hashlib.md5(u2.encode()).hexdigest()


def test_line_dedup_matches_python_reference_model(spark, tmp_path):
    """Differential test against an independent pure-Python model on a
    seeded random corpus with planted cross-doc duplicate blocks —
    conservation (n_tokens = removed + retained) plus the exact rebuilt
    clean_md5 per doc."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(88)
    planted = [
        " ".join(f"p{b}w{i}" for i in range(8)) for b in range(3)
    ]
    texts = []
    for d in range(40):
        toks = []
        for _ in range(rng.randrange(0, 5)):
            if rng.random() < 0.4:
                toks.extend(planted[rng.randrange(3)].split())
            else:
                toks.extend(
                    f"d{d}r{rng.randrange(1000)}" for _ in range(rng.randrange(1, 12))
                )
        texts.append(" ".join(toks))  # some docs end up empty
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": texts,
                "lang": ["en"] * 40,
                "source": ["src0"] * 40,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    # independent model: 8-token non-overlapping segments, remove any
    # segment string present in >= 2 distinct docs
    segs = {
        d: [t.split()[i : i + 8] for i in range(0, len(t.split()), 8)]
        for d, t in enumerate(texts)
    }
    seg_docs: dict[str, set[int]] = {}
    for d, ss in segs.items():
        for s in ss:
            seg_docs.setdefault(" ".join(s), set()).add(d)
    expect = {}
    for d, ss in segs.items():
        keep = [s for s in ss if len(seg_docs[" ".join(s)]) < 2]
        n_tok = sum(len(s) for s in ss)
        removed = n_tok - sum(len(s) for s in keep)
        clean = " ".join(" ".join(s) for s in keep)
        expect[d] = (
            len(ss),
            sum(1 for s in ss if len(seg_docs[" ".join(s)]) >= 2),
            n_tok,
            removed,
            hashlib.md5(clean.encode()).hexdigest(),
        )

    out = DOC_QUERIES["q_doc_line_dedup"](spark, str(tmp_path)).collect()
    assert len(out) == 40
    for r in out:
        n_seg, n_dup, n_tok, removed, clean_md5 = expect[r["doc_id"]]
        assert r["n_segments"] == n_seg
        assert r["n_dup_segments"] == n_dup
        assert r["n_tokens"] == n_tok
        assert r["tokens_removed"] == removed
        assert r["clean_md5"] == clean_md5
        assert r["n_tokens"] == r["tokens_removed"] + round(
            r["retained_frac"] * r["n_tokens"]
        ) or r["n_tokens"] == 0


def test_host_caps_and_shuffle_shards_invariants(spark, sf_dir):
    """Structural invariants at sf0.001: host_caps keeps exactly
    min(cap, n_docs) per source and never more tokens than exist;
    shuffle_shards emits a 1..n permutation per shard covering every
    doc exactly once."""
    from esvc_spark.queries.documents_curation import _HOST_CAP, _SHUF_SHARDS

    caps = DOC_QUERIES["q_doc_host_caps"](spark, sf_dir).collect()
    assert caps, "at least one source"
    for r in caps:
        assert r["n_kept"] == min(_HOST_CAP, r["n_docs"])
        assert r["n_dropped"] == r["n_docs"] - r["n_kept"]
        assert 0 < r["tokens_kept"] <= r["tokens_total"]

    rows = DOC_QUERIES["q_doc_shuffle_shards"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < _SHUF_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shard_balance_bound_gates_local_plan():
    """VERDICT r8 #3: the Chernoff bound on the largest mod-8 hash shard
    must (a) hold its derivation shape — ~n/8 times a shrinking (1+d)
    factor, (b) keep the cheap per-group window valid to ~8x the global
    row threshold, and (c) stay an upper bound on real shard sizes for
    the md5-derived hash at test scale."""
    from esvc_spark.core.spark_engine import TWO_PHASE_MIN_ROWS
    from esvc_spark.queries.documents_curation import (
        _SHUF_SHARDS,
        _shard_balance_bound,
    )

    # shape: monotone-ish n/8 scaling, vanishing slack
    assert _shard_balance_bound(0) == 1
    b_1m = _shard_balance_bound(1 << 20)
    assert (1 << 20) // 8 < b_1m < (1 << 20) // 8 * 1.2
    b_8m = _shard_balance_bound(8 << 20)
    assert (8 << 20) // 8 < b_8m < (8 << 20) // 8 * 1.05
    # the gate extends the local window ~8x past the global threshold
    assert b_8m <= TWO_PHASE_MIN_ROWS * 1.05
    assert _shard_balance_bound(100 << 20) > TWO_PHASE_MIN_ROWS

    # the bound really bounds: empirical max shard at a few sizes,
    # using the exact engine hash (first 15 md5 hex digits as an int —
    # documents_shared._h)
    import hashlib

    for n in (1000, 20_000):
        counts = [0] * _SHUF_SHARDS
        for i in range(n):
            h = int(hashlib.md5(f"shuf|{i}".encode()).hexdigest()[:15], 16)
            counts[h % _SHUF_SHARDS] += 1
        assert max(counts) <= _shard_balance_bound(n), (n, max(counts))
