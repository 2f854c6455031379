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


def set_events_read_confs(spark: SparkSession) -> None:
    """Confs an events read needs under ANY session (the driver harness
    uses a plain SparkSession without the repo's session factory):
    nanosAsLong so a TIMESTAMP(NANOS) file arrives as BIGINT ns instead of
    failing with PARQUET_TYPE_ILLEGAL, and a UTC session timezone so
    timestamp values are deterministic vs the naive-timestamp oracles."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TIMESTAMP microseconds regardless of the
    driver's parquet physical type (it has shipped both):
      * TIMESTAMP(NANOS) → BIGINT ns under nanosAsLong → integer-floored
        to µs (`div 1000`; float division would round and drift);
      * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ under
        Spark's inferTimestampNTZ → cast to TIMESTAMP, value-preserving
        under the UTC session tz both loaders pin (and what watermarks,
        unix_micros and window functions require)."""
    from pyspark.sql import functions as F

    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning + predicate pushdown reach the
    parquet scan because this is a plain file-source read."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        set_events_read_confs(spark)
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    return df


_ROW_COUNTS: dict[tuple[str, str], int] = {}


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of one testdata table — a COUNT over the plain parquet
    scan (answered from footer metadata, no data read), cached per
    (sf_dir, table) for the session lifetime since testdata is
    immutable. Queries use this as the cheap UPPER BOUND they thread
    into the rank/prefix helpers' `n_rows` size gate: any frame derived
    from one table (per-user aggregates, per-layout chunk rows, …) has
    at most the base table's rows, so the bound is safe — small bound →
    local window, big or unknown → two-phase partition-parallel plan."""
    key = (sf_dir, name)
    if key not in _ROW_COUNTS:
        _ROW_COUNTS[key] = table(spark, sf_dir, name).count()
    return _ROW_COUNTS[key]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
