"""Salting operators: results equal their unsalted equivalents on skewed
data; the salted plans actually spread the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esvc_spark.operators.skew import salted_distinct_count, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(900).select(
        F.lit(0).alias("k"), (F.col("id") % 37).alias("v")
    )
    tail = spark.range(100).select(
        (F.col("id") % 10 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


@pytest.fixture()
def dim(spark):
    return spark.range(11).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain(spark, skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k", "name").count()
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_left_join_keeps_unmatched(spark, skewed, dim):
    missing = skewed.unionByName(
        spark.createDataFrame([(99, 1)], "k BIGINT, v BIGINT")
    )
    out = salted_join(missing, dim, ["k"], n_salts=4, how="left")
    plain = missing.join(dim, "k", "left")
    assert out.count() == plain.count()
    assert out.filter("k = 99").count() == 1


def test_salted_distinct_count_exact(spark, skewed):
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(skewed, "k", "v", n_salts=8).collect()
    }
    want = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want
    assert got[0] == 37  # the hot key's exact distinct count


def test_salt_actually_spreads(spark, skewed):
    n = (
        skewed.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("v")), F.lit(8))
        )
        .filter("k = 0")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n > 1  # the hot key occupies multiple salt sub-keys
