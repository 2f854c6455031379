"""Graph persistence + import/merge + head compaction.

Parity with crates/exvc/src/main.rs:
  - save/load     ≙ main.rs:44-53, 267-276 (bincode+zstd → parquet+zstd)
  - import_merge  ≙ main.rs:54-111 (load foreign graph, idempotent append,
    union heads, minimize, try_merge, commit new head-set)
  - compact_heads ≙ main.rs:232-249 (re-minimize when > threshold heads)

The events table is the FIXTURES.md §B.1 schema:
    events_log(event_id BINARY, cmd INT, arg STRING(JSON),
               deps MAP<BINARY, BOOLEAN>)
    nstates(name STRING, heads ARRAY<BINARY>)
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .graph import Event, Graph, IncludeSpec
from .workcache import WorkCache

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", BinaryType(), False),
        StructField("cmd", IntegerType(), False),
        StructField("arg", StringType(), False),
        StructField("deps", MapType(BinaryType(), BooleanType()), False),
    ]
)

NSTATES_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("heads", ArrayType(BinaryType()), False),
    ]
)


def save_graph(spark: SparkSession, graph: Graph, path: str) -> None:
    rows = [
        (h, ev.cmd, json.dumps(ev.arg, sort_keys=True), dict(ev.deps))
        for h, ev in sorted(graph.events.items())
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).option("compression", "zstd").parquet(os.path.join(path, "events_log"))
    nrows = [(name, sorted(heads)) for name, heads in sorted(graph.nstates.items())]
    spark.createDataFrame(nrows, NSTATES_SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).option("compression", "zstd").parquet(os.path.join(path, "nstates"))


def load_graph(spark: SparkSession, path: str, arg_decode=json.loads) -> Graph:
    g = Graph()
    for r in spark.read.parquet(os.path.join(path, "events_log")).collect():
        g.events[bytes(r["event_id"])] = Event(
            cmd=r["cmd"],
            arg=arg_decode(r["arg"]),
            deps={bytes(k): v for k, v in (r["deps"] or {}).items()},
        )
    for r in spark.read.parquet(os.path.join(path, "nstates")).collect():
        g.nstates[r["name"]] = {bytes(h) for h in r["heads"]}
    return g


def ensure_events_idempotent(graph: Graph, other: Graph) -> None:
    """Append every event of `other` into `graph` in dependency order,
    collision-checked (≙ main.rs:68-87). The parquet-table equivalent of a
    MERGE INTO ... WHEN NOT MATCHED INSERT."""
    heads = other.nstates.get("", set(other.events.keys()))
    schedule = other.calculate_dependencies(
        set(), {h: IncludeSpec.INCLUDE_ALL for h in heads}
    )
    for h in schedule:
        ev = other.events[h]
        collision, got = graph.ensure_event(
            Event(cmd=ev.cmd, arg=ev.arg, deps=dict(ev.deps))
        )
        if collision is not None:
            from .graph import HashCollision

            raise HashCollision(got, collision)


def import_merge(wc: WorkCache, graph: Graph, other: Graph, state: str = "") -> set[bytes]:
    """Import a foreign graph and merge its head-set with ours
    (≙ main.rs:54-111). Returns the new merged head-set (also stored as
    nstates[state])."""
    ensure_events_idempotent(graph, other)
    ours = graph.nstates.get(state, set())
    theirs = other.nstates.get(state, set())
    union = {h: False for h in ours | theirs}
    minimized = set(graph.fold_state(union, expand=False).keys())
    wc.try_merge(graph, set(minimized | ours | theirs))
    merged = set(
        graph.fold_state({h: False for h in ours | theirs}, expand=False).keys()
    )
    graph.nstates[state] = merged
    return merged


def compact_heads(graph: Graph, state: str = "", threshold: int = 100) -> None:
    """Re-minimize a named head-set when it exceeds `threshold`
    (≙ main.rs:232-249)."""
    heads = graph.nstates.get(state)
    if heads and len(heads) > threshold:
        graph.nstates[state] = set(
            graph.fold_state({h: False for h in heads}, expand=False).keys()
        )


def append_head(graph: Graph, evid: bytes, state: str = "", threshold: int = 100) -> None:
    """Record a newly shelved event as a head (≙ main.rs:217-250)."""
    graph.nstates.setdefault(state, set()).add(evid)
    compact_heads(graph, state, threshold)


def events_dataframe(spark: SparkSession, graph: Graph):
    """The event log as a DataFrame (for SQL over the DAG)."""
    rows = [
        (h, ev.cmd, json.dumps(ev.arg, sort_keys=True), dict(ev.deps))
        for h, ev in sorted(graph.events.items())
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)
