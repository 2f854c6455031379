"""Brute-force oracles for the late round-4 additions (zipf, neyman,
dup_runs). The driver contract hash-checks them against DuckDB; these
recompute the full answer in plain Python at sf0.001, so an error that
both SQL dialects share identically would still be caught."""

from __future__ import annotations

import math
from collections import Counter

from esvc_spark.queries.documents import (
    _NEYMAN_N,
    _RUN_MIN_SH,
    _SHINGLE,
    QUERIES as DOC_QUERIES,
)


def _texts(spark, sf_dir):
    return {
        r["doc_id"]: (r["text"], r["lang"], r["n_chars"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


def test_zipf_normal_equations_exact(spark, sf_dir):
    docs = _texts(spark, sf_dir)
    by_lang: dict[str, Counter] = {}
    for _, (text, lang, _) in docs.items():
        by_lang.setdefault(lang, Counter()).update(text.split())

    def qlog2(x: int) -> int:
        e = x.bit_length() - 1
        return 16 * e + (16 * x) // (1 << e) - 16

    out = {r["lang"]: r for r in DOC_QUERIES["q_doc_zipf"](spark, sf_dir).collect()}
    assert set(out) == set(by_lang)
    for lang, cnt in by_lang.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [qlog2(i + 1) for i in range(len(ranked))]
        ys = [qlog2(c) for _, c in ranked]
        n = len(ranked)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        r = out[lang]
        assert r["n_terms"] == n
        assert r["total_tokens"] == sum(cnt.values())
        assert r["num"] == n * sxy - sx * sy
        assert r["den"] == n * sxx - sx * sx
        if r["den"]:
            assert abs(r["zipf_slope"] - r["num"] / r["den"]) < 1e-15
            # ranked by frequency: freq non-increasing in rank => slope <= 0
            assert r["zipf_slope"] <= 0


def test_neyman_allocation_exact(spark, sf_dir):
    docs = _texts(spark, sf_dir)
    strata: dict[str, list[int]] = {}
    for _, (_, lang, n_chars) in docs.items():
        strata.setdefault(lang, []).append(n_chars)
    w = {
        lang: math.isqrt(
            len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
        )
        for lang, xs in strata.items()
    }
    W = sum(w.values())
    alloc0 = {lang: (_NEYMAN_N * wh) // W for lang, wh in w.items()}
    rem = {lang: (_NEYMAN_N * wh) % W for lang, wh in w.items()}
    leftover = _NEYMAN_N - sum(alloc0.values())
    order = sorted(w, key=lambda lang: (-rem[lang], lang))
    alloc = {
        lang: alloc0[lang] + (1 if i < leftover else 0)
        for i, lang in enumerate(order)
    }
    out = {
        r["lang"]: r
        for r in DOC_QUERIES["q_doc_neyman_sample"](spark, sf_dir).collect()
    }
    assert set(out) == set(strata)
    assert sum(r["alloc"] for r in out.values()) == _NEYMAN_N
    for lang, r in out.items():
        assert r["n_docs"] == len(strata[lang])
        assert r["neyman_w"] == w[lang]
        assert r["alloc"] == alloc[lang]
        assert r["quota"] == min(alloc[lang], len(strata[lang]))
        assert r["n_taken"] == r["quota"]


def test_dup_runs_bruteforce(spark, sf_dir):
    docs = _texts(spark, sf_dir)
    shingles = {
        d: [
            " ".join(toks[i : i + _SHINGLE])
            for i in range(len(toks) - _SHINGLE + 1)
        ]
        for d, (text, _, _) in docs.items()
        for toks in [text.split()]
    }
    # df cap never fires at sf0.001 (50 docs < _DF_CAP), so plain shingle
    # equality is the exact match semantics
    expected = {}
    ids = sorted(shingles)
    for ai, a in enumerate(ids):
        sa = shingles[a]
        idx: dict[str, list[int]] = {}
        for i, s in enumerate(sa):
            idx.setdefault(s, []).append(i)
        for b in ids[ai + 1 :]:
            sb = shingles[b]
            matched = [
                (i, j) for j, s in enumerate(sb) for i in idx.get(s, ())
            ]
            if not matched:
                continue
            by_diag: dict[int, list[int]] = {}
            for i, j in matched:
                by_diag.setdefault(i - j, []).append(i)
            max_run, n_runs, n_matched = 0, 0, len(matched)
            for posns in by_diag.values():
                posns.sort()
                run = 1
                for p, q in zip(posns, posns[1:]):
                    if q == p + 1:
                        run += 1
                    else:
                        n_runs += 1
                        max_run = max(max_run, run)
                        run = 1
                n_runs += 1
                max_run = max(max_run, run)
            if max_run >= _RUN_MIN_SH:
                expected[(a, b)] = (max_run, n_runs, n_matched)
    out = {
        (r["doc_a"], r["doc_b"]): (
            r["max_run_shingles"],
            r["n_runs"],
            r["n_matched"],
        )
        for r in DOC_QUERIES["q_doc_dup_runs"](spark, sf_dir).collect()
    }
    assert out == expected
    for r in DOC_QUERIES["q_doc_dup_runs"](spark, sf_dir).collect():
        assert r["longest_run_tokens"] == r["max_run_shingles"] + _SHINGLE - 1
