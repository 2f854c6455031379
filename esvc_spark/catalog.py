"""Testdata catalog: loaders for the driver-generated parquet tables.

Tables (TESTDATA.md / FIXTURES.md §A): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table in
/root/testdata/sf{0.001,0.01,0.1}/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning + predicate pushdown reach the
    parquet scan because this is a plain file-source read.

    events.ts is TIMESTAMP(NANOS) parquet: with
    spark.sql.legacy.parquet.nanosAsLong it arrives as BIGINT nanoseconds
    and is truncated (floored) to microseconds here — matching DuckDB's
    ns→µs truncation, so oracle comparisons agree."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The conf is runtime-settable; set it here so the read works under
        # ANY session (the driver harness uses a plain SparkSession without
        # the repo's session factory). Without it the scan fails with
        # PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS)).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Timestamp determinism vs. naive-timestamp oracles regardless of
        # the host session's timezone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
