"""Source/sink round-trips: every format preserves values; partitioned
writes prune; bucketed writes remove the join shuffle on the bucket key."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from esvc_spark.plans import explain_str, plan_stats
from esvc_spark.sources import read_source, write_sink

SCHEMA = "k BIGINT, grp STRING, v DOUBLE"


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(
        [(i, f"g{i % 3}", i / 7.0) for i in range(100)], SCHEMA
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, small, tmp_path, fmt):
    p = str(tmp_path / fmt)
    write_sink(small, p, fmt=fmt, mode="overwrite")
    back = read_source(spark, p, fmt=fmt, schema=SCHEMA)
    assert sorted(back.collect()) == sorted(small.collect())


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, str(tmp_path), fmt="csv")


def test_partitioned_write_prunes(spark, small, tmp_path):
    p = str(tmp_path / "part")
    write_sink(small, p, partition_by=["grp"], mode="overwrite")
    df = read_source(spark, p).filter(F.col("grp") == "g1")
    assert df.count() == 33
    # the grp predicate becomes a partition filter (directory pruning),
    # not a data filter
    plan = explain_str(df, "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "g1" in m.group(1)


def test_bucketed_join_skips_shuffle(spark, small, tmp_path):
    name_a, name_b = "bsrc_a", "bsrc_b"
    for name in (name_a, name_b):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_sink(
            small,
            str(tmp_path / name),
            mode="overwrite",
            bucket_by=(4, ["k"]),
            sort_by=["k"],
            table_name=name,
        )
    joined = spark.table(name_a).join(spark.table(name_b), "k")
    st = plan_stats(joined)
    assert st["shuffles"] == 0, "bucketed equi-join must not reshuffle"
    assert joined.count() == 100


def test_schema_evolution_merge(spark, tmp_path):
    """A growing table (new column added by a later writer) reads as one
    frame with mergeSchema: old files surface NULL for the new column.
    The schema-evolution posture a long-lived 100 TB dataset needs."""
    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    write_sink(v1, p, mode="overwrite")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    write_sink(v2, p, mode="append")
    df = read_source(spark, p, mergeSchema="true")
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_compact_table(spark, tmp_path):
    """20 tiny files -> 4 evenly-sized files, same rows, atomic swap."""
    from esvc_spark.sources.io import compact_table

    p = str(tmp_path / "fragged")
    df = spark.range(1000).withColumnRenamed("id", "k")
    df.repartition(20).write.parquet(p)
    import os

    n_before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert n_before == 20
    n_after = compact_table(spark, p, target_files=4)
    assert n_after == 4
    assert spark.read.parquet(p).count() == 1000
