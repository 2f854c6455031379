"""Brute-force oracles for the third-session round-4 additions (SCD2,
PSI drift, Markov attribution, zone-map skipping, skyline). The driver
contract hash-checks these against DuckDB; here each answer is
recomputed in plain Python at sf0.001, so an error both SQL dialects
share identically would still be caught."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq

from esvc_spark.queries.events import (
    _MK_CHANNELS,
    _MK_SCALE,
    _MK_STEPS,
    _PSI_VSTEP,
    _SCD2_MOD,
    QUERIES as EV_QUERIES,
)
from esvc_spark.queries.relational import (
    _ZM_CHUNKS,
    _ZM_PRED_DAYS,
    QUERIES as REL_QUERIES,
)


def _events(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    raw = t.column("ts").cast(pa.int64()).to_pylist()
    div = 1000 if str(t.column("ts").type).startswith("timestamp[ns") else 1
    return [
        {
            "event_id": e,
            "user_id": u,
            "event_type": ty,
            "value": v,
            "t_us": ts // div,
        }
        for e, u, ty, v, ts in zip(
            t.column("event_id").to_pylist(),
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
            raw,
        )
    ]


def _qlog2(x: int) -> int:
    e = x.bit_length() - 1
    return 16 * e + (16 * x) // (1 << e) - 16


def _texts(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    return {
        d: (txt, lang, nc)
        for d, txt, lang, nc in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    }


def test_scd2_intervals_exact(spark, sf_dir):
    ev = [e for e in _events(sf_dir) if e["user_id"] % _SCD2_MOD == 0]
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    expected = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda e: (e["t_us"], e["event_id"]))
        runs = []  # (state, valid_from, n_events)
        for e in rows:
            if runs and runs[-1][0] == e["event_type"]:
                runs[-1][2] += 1
            else:
                runs.append([e["event_type"], e["t_us"], 1])
        for v, (state, frm, n) in enumerate(runs, start=1):
            to = runs[v][1] if v < len(runs) else None
            expected[(uid, v)] = (
                state, frm, to, n, None if to is None else to - frm
            )
    out = {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from_us"], r["valid_to_us"],
            r["n_events"], r["dwell_us"],
        )
        for r in EV_QUERIES["q_ev_scd2"](spark, sf_dir).collect()
    }
    assert out == expected


def test_psi_drift_exact(spark, sf_dir):
    ev = _events(sf_dir)
    mid = (min(e["t_us"] for e in ev) + max(e["t_us"] for e in ev)) // 2
    cells: dict[tuple[str, str], list[int]] = {}
    for e in ev:
        ref = e["t_us"] <= mid
        for feat, b in (
            ("event_type", e["event_type"]),
            ("hour_of_day", str((e["t_us"] // 3_600_000_000) % 24)),
            # floor of the IEEE quotient — exactly what both engines
            # compute (Python's float // is subtly different at edges)
            ("value_bin", str(math.floor(e["value"] / _PSI_VSTEP))),
        ):
            c = cells.setdefault((feat, b), [0, 0])
            c[0 if ref else 1] += 1
    expected = {}
    for feat in {f for f, _ in cells}:
        fc = {b: c for (f, b), c in cells.items() if f == feat}
        ta = sum(a for a, _ in fc.values())
        tb = sum(b for _, b in fc.values())
        k = len(fc)
        psi_q = sum(
            (a * tb - b * ta)
            * (_qlog2((a + 1) * (tb + k)) - _qlog2((b + 1) * (ta + k)))
            for a, b in fc.values()
        )
        expected[feat] = (k, ta, tb, psi_q, psi_q / (16 * ta * tb))
    out = {
        r["feature"]: (
            r["n_bins"], r["ref_rows"], r["cur_rows"], r["psi_q"], r["psi"]
        )
        for r in EV_QUERIES["q_ev_psi_drift"](spark, sf_dir).collect()
    }
    assert set(out) == set(expected)
    for feat, (k, ta, tb, psi_q, psi) in expected.items():
        got = out[feat]
        assert got[:4] == (k, ta, tb, psi_q)
        assert abs(got[4] - psi) < 1e-15
        # identical distributions give PSI 0; drift can only raise it —
        # each term (a·B − b·A)·(qlog2-diff) has matching signs, so the
        # sum is non-negative up to the qlog2 approximation error
        assert got[4] > -0.01


def test_markov_removal_effect_exact(spark, sf_dir):
    ev = _events(sf_dir)
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    edges = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda e: (e["t_us"], e["event_id"]))
        journeys, cur = [], []
        for e in rows:
            cur.append(e["event_type"])
            if e["event_type"] == "purchase":
                journeys.append(cur)
                cur = []
        if cur:
            journeys.append(cur)
        for j in journeys:
            states = ["conv" if s == "purchase" else s for s in j]
            prev = "start"
            for s in states:
                edges[(prev, s)] += 1
                prev = s
            if states[-1] != "conv":
                edges[(states[-1], "null")] += 1
    outdeg = Counter()
    for (f, _), c in edges.items():
        outdeg[f] += c
    base = {ft: (c * _MK_SCALE) // outdeg[ft[0]] for ft, c in edges.items()}

    def absorb(removed):
        wm: dict[tuple[str, str], int] = {}
        for (f, t), v in base.items():
            if f == removed:
                continue
            t2 = "null" if t == removed else t
            wm[(f, t2)] = wm.get((f, t2), 0) + v
        wm[("conv", "conv")] = _MK_SCALE
        wm[("null", "null")] = _MK_SCALE
        p = {"start": _MK_SCALE}
        for _ in range(_MK_STEPS):
            nxt: dict[str, int] = {}
            for (f, t), v in wm.items():
                if f in p:
                    nxt[t] = nxt.get(t, 0) + p[f] * v
            p = {t: v // _MK_SCALE for t, v in nxt.items()}
        return p.get("conv", 0)

    p_full = absorb(None)
    out = {
        r["channel"]: (
            r["p_conv_full_q"], r["p_conv_removed_q"],
            r["removal_q"], r["removal_effect"],
        )
        for r in EV_QUERIES["q_ev_markov_attribution"](spark, sf_dir).collect()
    }
    assert set(out) == set(_MK_CHANNELS)
    assert p_full > 0  # the corpus always has purchases
    for ch in _MK_CHANNELS:
        p_rm = absorb(ch)
        assert out[ch] == (
            p_full, p_rm, p_full - p_rm, (p_full - p_rm) / p_full
        )
        # removing a touchpoint can only lose conversion mass
        assert out[ch][2] >= 0


def test_zonemap_skipping_exact(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
    )
    div = (
        1000
        if str(t.column("l_shipdate").type).startswith("timestamp[ns")
        else 1
    )
    days = [
        (v // div) // 86_400_000_000
        for v in t.column("l_shipdate").cast(pa.int64()).to_pylist()
    ]
    rows = [
        (ok * 8 + ln, d)
        for ok, ln, d in zip(
            t.column("l_orderkey").to_pylist(),
            t.column("l_linenumber").to_pylist(),
            days,
        )
    ]
    dmin, dmax = min(days), max(days)
    preds = [
        (dmin + p * _ZM_PRED_DAYS, dmin + p * _ZM_PRED_DAYS + _ZM_PRED_DAYS - 1)
        for p in range((dmax - dmin) // _ZM_PRED_DAYS + 1)
    ]

    def hkey(akey: int) -> int:
        return int(hashlib.md5(str(akey).encode()).hexdigest()[:15], 16)

    def audit(ordered_days):
        n = len(ordered_days)
        base, extra = divmod(n, _ZM_CHUNKS)
        zones, i = [], 0
        for c in range(_ZM_CHUNKS):
            size = base + (1 if c < extra else 0)
            chunk = ordered_days[i:i + size]
            i += size
            if chunk:
                zones.append((min(chunk), max(chunk)))
        scanned = sum(
            1
            for zmin, zmax in zones
            for pmin, pmax in preds
            if zmin <= pmax and zmax >= pmin
        )
        return len(zones), scanned

    expected = {}
    for layout, key in (
        ("arrival", lambda r: (r[0], r[0], r[1])),
        ("shipdate", lambda r: (r[1], r[0], r[1])),
        ("hash", lambda r: (hkey(r[0]), r[0], r[1])),
    ):
        ordered = [d for _, d in sorted(((key(r), r[1]) for r in rows))]
        n_chunks, scanned = audit(ordered)
        expected[layout] = (
            n_chunks, len(preds), scanned,
            1.0 - scanned / (n_chunks * len(preds)),
        )
    out = {
        r["layout"]: (
            r["n_chunks"], r["n_preds"], r["chunks_scanned"], r["skip_ratio"]
        )
        for r in REL_QUERIES["q_zonemap_skipping"](spark, sf_dir).collect()
    }
    assert out == expected
    # the clustered layout must never scan more than the scattered ones
    assert out["shipdate"][2] <= out["arrival"][2]
    assert out["shipdate"][2] <= out["hash"][2]


def test_skyline_dominance_brute_force(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    per: dict[int, list] = {}
    for ck, tp in zip(
        t.column("o_custkey").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        d = Decimal(tp).quantize(Decimal("0.01"), ROUND_HALF_UP)
        e = per.setdefault(ck, [Decimal(0), 0])
        e[0] += d
        e[1] += 1
    pts = {ck: (sp, n) for ck, (sp, n) in per.items()}

    def dominated(a, b):  # b dominates a
        return b[0] >= a[0] and b[1] >= a[1] and b != a

    expected = {
        ck: (float(sp), n)
        for ck, (sp, n) in pts.items()
        if not any(dominated((sp, n), other) for other in pts.values())
    }
    out = {
        r["o_custkey"]: (r["total_spend"], r["n_orders"])
        for r in REL_QUERIES["q_skyline_customers"](spark, sf_dir).collect()
    }
    assert out == expected


def test_survival_km_exact(spark, sf_dir):
    from esvc_spark.queries.events import _HOUR_US, _KM_SCALE

    ev = _events(sf_dir)
    per_user: dict[int, list] = {}
    for e in ev:
        per_user.setdefault(e["user_id"], []).append(e)
    durs = []  # (dur_h, event)
    for rows in per_user.values():
        t0 = min(e["t_us"] for e in rows)
        purch = [e["t_us"] for e in rows if e["event_type"] == "purchase"]
        if purch:
            durs.append(((min(purch) - t0) // _HOUR_US, 1))
        else:
            durs.append(((max(e["t_us"] for e in rows) - t0) // _HOUR_US, 0))
    times = sorted({d for d, ev_ in durs if ev_ == 1})
    expected, acc = {}, _KM_SCALE
    for t in times:
        nr = sum(1 for d, _ in durs if d >= t)
        dt = sum(1 for d, ev_ in durs if ev_ == 1 and d == t)
        acc = (acc * (nr - dt)) // nr
        expected[t] = (nr, dt, acc, acc / _KM_SCALE)
    out = {
        r["t_hours"]: (
            r["n_risk"], r["d_events"], r["surv_q"], r["survival"]
        )
        for r in EV_QUERIES["q_ev_survival"](spark, sf_dir).collect()
    }
    assert out == expected
    # product-limit estimator is non-increasing in t
    sq = [out[t][2] for t in sorted(out)]
    assert all(a >= b for a, b in zip(sq, sq[1:]))


def test_rake_scores_exact(spark, sf_dir):
    from esvc_spark.queries.documents import (
        _RAKE_MAX_LEN,
        _RAKE_STOP,
        _RAKE_TOP,
        QUERIES as DQ,
    )

    docs = _texts(spark, sf_dir)
    occur = []  # list of phrases (as word tuples)
    for _, (text, _, _) in docs.items():
        run = []
        for tok in text.split():
            if tok in _RAKE_STOP:
                if run:
                    occur.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            occur.append(tuple(run))
    occur = [p for p in occur if len(p) <= _RAKE_MAX_LEN]
    freq, deg = Counter(), Counter()
    for p in occur:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wscore = {w: (deg[w] * 1048576) // freq[w] for w in freq}
    stats: dict[tuple, list] = {}
    for p in occur:
        st = stats.setdefault(p, [0, 0])
        st[0] += 1
        st[1] = sum(wscore[w] for w in p)
    ranked = sorted(
        ((s, n, " ".join(p)) for p, (n, s) in stats.items()),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:_RAKE_TOP]
    expected = {
        ph: (n, s, s / 1048576.0) for s, n, ph in ranked
    }
    out = {
        r["phrase"]: (r["n_occurrences"], r["score_q"], r["rake_score"])
        for r in DQ["q_doc_rake"](spark, sf_dir).collect()
    }
    assert out == expected
    for r in DQ["q_doc_rake"](spark, sf_dir).collect():
        assert 1 <= r["n_words"] <= _RAKE_MAX_LEN
        assert r["phrase"].count(" ") == r["n_words"] - 1


def test_pca_power_matches_numpy_eigenvector(spark, sf_dir):
    import numpy as np

    from esvc_spark.queries.embeddings import QUERIES as EQ

    out = EQ["q_emb_pca_power"](spark, sf_dir).collect()
    v = np.array(
        [r["loading_q"] for r in sorted(out, key=lambda r: r["dim"])],
        dtype=float,
    )
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    cov = np.cov(emb, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    # the fixed-point iterate must align with the true top eigenvector
    assert cos > 0.99, cos
    # sign pin: the largest-|loading| dim is positive
    piv = max(range(len(v)), key=lambda i: (abs(v[i]), -i))
    assert v[piv] > 0
