"""Structured-Streaming pipelines over the `events` stream (SURVEY.md §7
phase 3; the "event log as a Structured-Streaming-fed table" design the
reference's append-only graph maps onto — crates/esvc-core/src/graph.rs:23-29
becomes a streaming sink here).

The transformations are the streaming twins of esvc_spark.queries.events:
identical window/session semantics, expressed incrementally with
watermarks so late data is bounded and state is evictable. Differences
forced by the streaming model:

  * distinct counts use approx_count_distinct (exact distinct is
    unbounded-state in a stream);
  * dedup uses dropDuplicates within the watermark horizon.

At 100 TB/day these run partition-parallel off a file/Kafka source; state
store size is bounded by (watermark horizon x key cardinality), and
`ingest_into_event_log` keeps the event-log append idempotent so replayed
micro-batches (at-least-once sources) cannot duplicate events.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The on-file physical timestamp type has varied across driver testdata
# generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS) NTZ), so reads pin
# the footer schema and normalize ts via catalog.normalize_event_ts.


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory (or glob) of events parquet.
    Schema must be pinned for streaming reads (taken from the batch
    footer); maxFilesPerTrigger bounds micro-batch size for backpressure."""
    from ..catalog import normalize_event_ts, set_events_read_confs

    set_events_read_confs(spark)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return normalize_event_ts(df)


def tumbling_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling windows per event type (streaming twin of
    q_ev_tumbling_hourly; exact-decimal sum, approx distinct users)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sessionize_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """30-minute-gap session windows per user (streaming twin of
    q_ev_sessionize). State per open session, evicted past the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "last_ts",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate events by (user_id, event_type, value) arriving
    within the watermark horizon of each other — the streaming twin of
    q_ev_dedup_content's grouping (late/duplicate handling per
    TESTDATA.md).

    Uses dropDuplicatesWithinWatermark (Spark 3.5+): state for a key is
    evicted once the watermark passes the first-seen event time, so state
    is bounded by (horizon x key cardinality). A plain dropDuplicates on a
    key subset that excludes the event-time column would never evict —
    whole-stream dedup with unbounded state."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "value"]
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming DataFrame to completion with availableNow into an
    in-memory table; returns the result as a batch DataFrame. Test/debug
    harness — real deployments use parquet/Kafka sinks with checkpoints."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def ingest_into_event_log(
    stream: DataFrame,
    log_dir: str,
    checkpoint_dir: str,
    to_event: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """foreachBatch sink appending stream rows into an append-only event
    table, idempotently (replayed micro-batches can't duplicate rows) —
    the streaming realization of Graph.ensure_event's get-or-insert
    (crates/esvc-core/src/graph.rs:132-155): content identity wins, not
    arrival count.

    `to_event` maps the raw micro-batch to the log schema; default keeps
    the events schema and treats event_id as the content address.
    """

    def _append(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        out = to_event(batch) if to_event is not None else batch
        out = out.dropDuplicates(["event_id"])
        target = os.path.join(log_dir, "events_stream")
        # Probe the target THROUGH Spark, not the driver's local
        # filesystem: on HDFS/S3/DBFS os.path.exists is always false and
        # the anti-join would silently be skipped.
        try:
            existing = spark.read.parquet(target).select("event_id")
        except AnalysisException:
            existing = None
        if existing is not None:
            out = out.join(existing, "event_id", "left_anti")
        out.write.mode("append").option("compression", "zstd").parquet(target)

    q = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
