"""applyInPandasWithState operators: state survives micro-batch
boundaries (forced via maxFilesPerTrigger=1) and final values equal the
batch equivalents."""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from esvc_spark.catalog import table as T
from esvc_spark.streaming import read_events_stream
from esvc_spark.streaming.stateful import (
    running_user_totals,
    streaming_head_tracker,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF_DIR, "events.parquet")

# Recovery tests run under BOTH state-store providers (VERDICT r6 #6):
# the default HDFS-backed store and RocksDB — the provider a 100 TB
# stream actually runs (state no longer bounded by executor heap). The
# provider is recorded in the checkpoint, so each parametrized case
# uses its own checkpointLocation.
_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture(params=sorted(_PROVIDERS))
def state_provider(request, spark):
    cls = _PROVIDERS[request.param]
    try:
        spark._jvm.java.lang.Class.forName(cls)
    except Exception:
        pytest.skip(f"state store provider class not on classpath: {cls}")
    old = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, cls)
    yield request.param
    if old is None:
        spark.conf.unset(_PROVIDER_CONF)
    else:
        spark.conf.set(_PROVIDER_CONF, old)


@pytest.fixture(scope="module")
def two_batch_dir(tmp_path_factory):
    """Split the events file in two so the stream runs 2 micro-batches."""
    d = str(tmp_path_factory.mktemp("two_batches"))
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(d, "a.parquet"))
    pq.write_table(t.slice(half), os.path.join(d, "b.parquet"))
    return d


def _run_update(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_running_totals_match_batch(spark, two_batch_dir):
    stream = read_events_stream(spark, two_batch_dir, max_files_per_trigger=1)
    name = f"run_{uuid.uuid4().hex}"
    out = _run_update(running_user_totals(stream), name).toPandas()
    # update mode emits one row per user per touching micro-batch: the
    # LAST row per user is the lifetime total
    final = out.sort_values("n_events").groupby("user_id").last()

    batch = (
        T(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        got = final.loc[uid]
        assert got["n_events"] == row["n_events"]
        assert got["value_cents"] == int(row["sum_value"] * 100)
        assert got["last_ts"] == row["last_ts"]
    # state crossed batches: some user must appear twice (two emissions)
    assert (out.groupby("user_id").size() > 1).any()


def test_head_tracker_maintains_antichain(spark, tmp_path):
    import json

    rows = [
        ("g", "e1", 1, "[]"),
        ("g", "e2", 2, json.dumps(["e1"])),  # supersedes e1
        ("g", "e3", 3, "[]"),  # parallel branch head
        ("h", "f1", 1, "[]"),  # separate graph key
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = __import__("pandas").DataFrame(
        rows, columns=["graph_key", "event_id", "ts", "deps_json"]
    )
    pdf.to_parquet(os.path.join(src, "a.parquet"))

    stream = (
        spark.readStream.schema(
            "graph_key STRING, event_id STRING, ts BIGINT, deps_json STRING"
        )
        .parquet(src)
    )
    name = f"heads_{uuid.uuid4().hex}"
    out = _run_update(streaming_head_tracker(stream), name)
    got = {r["graph_key"]: (sorted(r["heads"]), r["n_events"]) for r in out.collect()}
    assert got["g"] == (["e2", "e3"], 3)  # e1 folded away, e2/e3 parallel
    assert got["h"] == (["f1"], 1)


def test_head_tracker_out_of_order_delivery(spark, tmp_path):
    """The fold is order-independent: a dep delivered AFTER the event
    naming it (ts inversion, split across micro-batches) must still end
    up superseded — the pending-supersession state, not arrival luck,
    decides head membership."""
    import json

    import pandas as pd

    # e2 (deps e1) and e4 (deps e3) arrive in batch 1; their deps e1/e3
    # arrive in batch 2. Diamond fan-in: e5 also names e1 (already
    # superseded by then). Correct final antichain: {e2, e4, e5}.
    batch1 = [
        ("g", "e2", 10, json.dumps(["e1"])),
        ("g", "e4", 11, json.dumps(["e3"])),
    ]
    batch2 = [
        ("g", "e1", 20, "[]"),
        ("g", "e3", 21, "[]"),
        ("g", "e5", 22, json.dumps(["e1"])),
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    cols = ["graph_key", "event_id", "ts", "deps_json"]
    pd.DataFrame(batch1, columns=cols).to_parquet(os.path.join(src, "a.parquet"))
    pd.DataFrame(batch2, columns=cols).to_parquet(os.path.join(src, "b.parquet"))

    stream = (
        spark.readStream.schema(
            "graph_key STRING, event_id STRING, ts BIGINT, deps_json STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"heads_{uuid.uuid4().hex}"
    out = _run_update(streaming_head_tracker(stream), name).toPandas()
    final = out.sort_values("n_events").groupby("graph_key").last()
    assert sorted(final.loc["g", "heads"]) == ["e2", "e4", "e5"]
    assert final.loc["g", "n_events"] == 5


def test_running_totals_recover_from_checkpoint(spark, tmp_path, state_provider):
    """State survives a full query STOP + RESTART from the same
    checkpoint: a second query started on the same checkpointLocation
    resumes the per-user lifetime counters (emitting batch-2 users with
    their FULL-history totals) instead of restarting from zero — the
    state-store recovery every production stream relies on."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(src, "a.parquet"))

    def run_phase(outdir):
        # memory sink is not checkpoint-recoverable; foreachBatch is —
        # each phase appends its emissions to its own directory
        q = (
            running_user_totals(read_events_stream(spark, src))
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(outdir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(outdir).toPandas()

    run_phase(str(tmp_path / "out1"))
    # phase 2: new file arrives, NEW query object, SAME checkpoint
    pq.write_table(t.slice(half), os.path.join(src, "b.parquet"))
    out2 = run_phase(str(tmp_path / "out2"))
    assert len(out2) > 0  # phase 2 processed only the new file

    batch = (
        T(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * 100)).cast("long").alias("cents"),
        )
        .toPandas()
        .set_index("user_id")
    )
    final = out2.sort_values("n_events").groupby("user_id").last()
    for uid, row in final.iterrows():
        # lifetime totals, not batch-2-only totals -> state was recovered
        assert row["n_events"] == batch.loc[uid, "n_events"], uid
        assert row["value_cents"] == batch.loc[uid, "cents"], uid


def test_head_tracker_recover_from_checkpoint(spark, tmp_path, state_provider):
    """The esvc head-set state survives a query restart: after recovery
    the tracker sees the full event count and the post-restart event
    supersedes a head it only knows from the checkpointed state."""
    import json

    import pandas as pd

    cols = ["graph_key", "event_id", "ts", "deps_json"]
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame(
        [("g", "e1", 1, "[]"), ("g", "e2", 2, json.dumps(["e1"]))], columns=cols
    ).to_parquet(os.path.join(src, "a.parquet"))

    def run_phase(outdir):
        stream = (
            spark.readStream.schema(
                "graph_key STRING, event_id STRING, ts BIGINT, deps_json STRING"
            ).parquet(src)
        )
        q = (
            streaming_head_tracker(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(outdir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(outdir).toPandas()

    out1 = run_phase(str(tmp_path / "out1"))
    assert sorted(out1.iloc[-1]["heads"]) == ["e2"]
    # restart: e3 supersedes e2 — a head the new query only knows from
    # the recovered state; n_events proves the counter resumed too
    pd.DataFrame(
        [("g", "e3", 3, json.dumps(["e2"]))], columns=cols
    ).to_parquet(os.path.join(src, "b.parquet"))
    out2 = run_phase(str(tmp_path / "out2"))
    assert len(out2) == 1
    assert sorted(out2.iloc[0]["heads"]) == ["e3"]
    assert out2.iloc[0]["n_events"] == 3


def test_event_log_pipeline_recover_from_checkpoint(
    spark, tmp_path, state_provider
):
    """The streamed event-log loop (pipelines.event_log_stream_pipeline:
    content-addressed MERGE append + per-batch append_head/compaction)
    survives a full query STOP + RESTART from the same checkpoint under
    both state-store providers: phase 2 processes ONLY the new file
    (checkpoint offsets recovered, no duplicate appends), and the final
    log + minimized head set equal the closed form over all events."""
    from esvc_spark.streaming.pipelines import (
        _superseded,
        event_log_stream_pipeline,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    work = str(tmp_path / "work")
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(src, "a.parquet"))

    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        event_log_stream_pipeline(
            read_events_stream(spark, src), work_dir=work,
            checkpoint_dir=ckpt,
        )
        n1 = spark.read.parquet(os.path.join(work, "events_log")).count()
        # phase 2: new file, NEW query, SAME checkpoint — resumes offsets
        pq.write_table(t.slice(half), os.path.join(src, "b.parquet"))
        event_log_stream_pipeline(
            read_events_stream(spark, src), work_dir=work,
            checkpoint_dir=ckpt,
        )
        log = spark.read.parquet(os.path.join(work, "events_log"))
        src_ids = {r["src_id"] for r in log.select("src_id").collect()}
        want_ids = {
            r["event_id"]
            for r in T(spark, SF_DIR, "events").select("event_id").collect()
        }
        # no duplicates (content-address idempotence held across the
        # restart) and nothing lost
        assert log.count() == len(src_ids) == len(want_ids)
        assert src_ids == want_ids
        assert log.count() > n1  # phase 2 really appended the new file

        heads = _superseded(
            spark.read.parquet(os.path.join(work, "heads")), log
        )
        got_heads = {r["head_src"] for r in heads.collect()}
        want_heads = {
            i for i in want_ids
            if (i + 16) not in want_ids or ((i + 16) // 16) % 3 == 0
        }
        assert got_heads == want_heads
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
