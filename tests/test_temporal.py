"""asof_join / range_join edge cases: exact-ts ties, no-match nulls,
bucket-boundary pairs."""

from __future__ import annotations

import datetime as dt

from esvc_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_tie_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9))],
        "id INT, k INT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(10, _ts(5), 100.0), (10, _ts(2), 50.0), (20, _ts(10), 9.0)],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    out = {
        r["id"]: r["v"]
        for r in asof_join(left, right, on="ts", by=["k"], value_cols=["v"]).collect()
    }
    assert out[1] == 100.0  # tie at equal ts matches (<= semantics)
    assert out[2] is None  # nothing at or before ts=1
    assert out[3] is None  # right row is after left ts


def test_asof_carries_latest(spark):
    left = spark.createDataFrame([(1, 1, _ts(30))], "id INT, k INT, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(1, _ts(s), float(s)) for s in (3, 7, 29)], "k INT, ts TIMESTAMP, v DOUBLE"
    )
    (row,) = asof_join(left, right, on="ts", by=["k"], value_cols=["v"]).collect()
    assert row["v"] == 29.0


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 1, _ts(0))], "id INT, k INT, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(s, 1, _ts(s)) for s in (1, 5, 6, 59)], "rid INT, k INT, ts TIMESTAMP"
    )
    got = sorted(
        r["rid_r"]
        for r in range_join(
            left, right, on="ts", by=["k"], lower_us=1_000_000, upper_us=6_000_000
        ).collect()
    )
    # 1s and 5s are in range; 6s is the inclusive upper edge; 59s is out
    assert got == [1, 5, 6]


def test_range_join_cross_bucket(spark):
    # pair straddles a bucket boundary (bucket = upper = 10s)
    left = spark.createDataFrame([(1, 1, _ts(9))], "id INT, k INT, ts TIMESTAMP")
    right = spark.createDataFrame([(2, 1, _ts(11))], "rid INT, k INT, ts TIMESTAMP")
    got = range_join(
        left, right, on="ts", by=["k"], lower_us=0, upper_us=10_000_000
    ).collect()
    assert len(got) == 1 and got[0]["_gap_us"] == 2_000_000
