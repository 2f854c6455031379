"""Property tests for the temporal operators: asof_join must agree with
pandas merge_asof on arbitrary keyed event sets, range_join with a plain
nested-loop filter."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from esvc_spark.operators.temporal import asof_join, range_join

_BASE = dt.datetime(2024, 1, 1)

# (key, second-offset) pairs; small domains force key collisions and ts ties
_lrows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
)
_rrows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
)


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(lrows=_lrows, rrows=_rrows)
def test_asof_matches_pandas_merge_asof(sparkmod, lrows, rrows):
    spark = sparkmod
    left = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(lrows)],
        "id INT, k INT, ts TIMESTAMP",
    )
    # right must be unique per (k, ts): dedupe keeping max value
    rmap = {}
    for k, s in rrows:
        rmap[(k, s)] = max(rmap.get((k, s), float("-inf")), float(s))
    right = spark.createDataFrame(
        [
            (k, _BASE + dt.timedelta(seconds=s), v)
            for (k, s), v in sorted(rmap.items())
        ],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    got = (
        asof_join(left, right, on="ts", by=["k"], value_cols=["v"])
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    lp = left.toPandas().sort_values(["ts", "id"], ignore_index=True)
    rp = right.toPandas().sort_values("ts", ignore_index=True)
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        .sort_values("id", ignore_index=True)
    )
    assert list(got["id"]) == list(want["id"])
    a, b = got["v"].tolist(), want["v"].tolist()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (pd.isna(x) and pd.isna(y)) or x == y


_nrows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.booleans()),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(lrows=_lrows, rrows=_nrows)
def test_asof_nearest_matches_bruteforce(sparkmod, lrows, rrows):
    """Nearest-direction brute force, INCLUDING null value columns: the
    matched timestamp and the (possibly null) value must come from the
    SAME right row — the failure mode the _rrow struct exists to stop."""
    from esvc_spark.operators.temporal import asof_nearest_join

    spark = sparkmod
    left = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(lrows)],
        "id INT, k INT, t BIGINT",
    )
    rmap = {}
    for k, s, has_v in rrows:
        rmap[(k, s)] = float(s) if has_v else None
    right = spark.createDataFrame(
        [(k, s, v) for (k, s), v in sorted(rmap.items())],
        "k INT, t BIGINT, v DOUBLE",
    )
    got = {
        r["id"]: r
        for r in asof_nearest_join(
            left, right, on="t", by=["k"], value_cols=["v"]
        ).collect()
    }
    for i, (k, s) in enumerate(lrows):
        cands = [(rs, v) for (rk, rs), v in rmap.items() if rk == k]
        r = got[i]
        if not cands:
            assert r["matched_on"] is None and r["direction"] is None
            continue
        best_t, best_v = min(
            cands, key=lambda c: (abs(c[0] - s), c[0] > s)
        )
        assert r["matched_on"] == best_t
        assert (r["v"] is None and best_v is None) or r["v"] == best_v
        assert r["direction"] == ("backward" if best_t <= s else "forward")


@settings(max_examples=15, deadline=None)
@given(lrows=_lrows, rrows=_rrows, lo=st.integers(0, 5), width=st.integers(1, 20))
def test_range_join_matches_nested_loop(sparkmod, lrows, rrows, lo, width):
    spark = sparkmod
    lower, upper = lo * 1_000_000, (lo + width) * 1_000_000
    left = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(lrows)],
        "lid INT, k INT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rrows)],
        "rid INT, k INT, ts TIMESTAMP",
    )
    got = sorted(
        (r["lid"], r["rid_r"])
        for r in range_join(
            left, right, on="ts", by=["k"], lower_us=lower, upper_us=upper
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs) in enumerate(rrows)
        if lk == rk and lower <= (rs - ls) * 1_000_000 <= upper
    )
    assert got == want
