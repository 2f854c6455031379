"""Custom stateful streaming operators (applyInPandasWithState).

Where watermarked windows (pipelines.py) cover time-bucketed aggregation,
these cover semantics Spark's built-in stateful ops can't express:

  * `running_user_totals`: per-user lifetime counters that emit an
    updated row every micro-batch an event arrives in — a streaming
    materialized aggregate with explicit state (count, exact cent-scaled
    value sum, last seen timestamp).
  * `streaming_head_tracker`: the esvc head-set maintained incrementally
    — the streaming twin of nstates[""] upkeep (crates/exvc/src/
    main.rs:217-250): per graph-key state holds the current head ids; an
    arriving event whose deps cover existing heads replaces them.

State is per group key, held in the state store between micro-batches and
evictable by timeout — at cluster scale this shards by key hash over
executors, with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id LONG, n_events LONG, value_cents LONG, last_ts TIMESTAMP"
_RUNNING_STATE = "n LONG, cents LONG, last LONG"


def _running_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents, last = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        # exact integer cents (value has 2-decimal scale) — float sums
        # would drift across batch boundaries
        cents += int(round(pdf["value"].mul(100).sum()))
        last = max(last, int(pdf["ts"].astype("int64").max()))
    state.update((n, cents, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_cents": [cents],
            "last_ts": [pd.Timestamp(last, unit="ns")],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user lifetime (count, exact value sum, last ts), one updated
    row per user per micro-batch containing that user."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        RUNNING_SCHEMA,
        _RUNNING_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


HEADS_SCHEMA = "graph_key STRING, heads ARRAY<STRING>, n_events LONG"
# STATE-FORMAT COMPATIBILITY (round 7, ADVICE r6): `pending_json` was
# added in round 6, growing the state row from 2 to 3 fields. Spark's
# state-store schema validation REJECTS a restart against a checkpoint
# written by the 2-field version before any user code runs, so there is
# no in-function migration hook — restarting an upgraded head-tracker
# requires a NEW checkpointLocation (replaying the source from its
# retained offset, which the order-independent fold makes safe). This
# is the standard applyInPandasWithState upgrade rule; bump this note
# whenever _HEADS_STATE changes shape.
_HEADS_STATE = "heads_json STRING, pending_json STRING, n LONG"


def _heads_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json

    heads_json, pending_json, n = state.get if state.exists else ("[]", "[]", 0)
    heads: set[str] = set(json.loads(heads_json))
    # deps named by an arrived event whose target has not arrived yet:
    # when that target shows up it is born already-superseded. This makes
    # the fold EXACTLY order-independent under exactly-once delivery —
    # out-of-order arrival (the norm on a real bus) can no longer leave a
    # superseded id in the head set. Fan-in deps whose target already
    # arrived may linger in `pending`; they never affect `heads` (ids
    # arrive at most once) and at scale would be pruned by a state TTL.
    pending: set[str] = set(json.loads(pending_json))
    for pdf in batches:
        for _, row in pdf.sort_values(["ts", "event_id"]).iterrows():
            deps = set(json.loads(row["deps_json"])) if row["deps_json"] else set()
            pending |= deps - heads  # supersessions seen before their target
            heads -= deps  # an event supersedes the heads it depends on
            eid = str(row["event_id"])
            if eid in pending:
                pending.discard(eid)  # already superseded by an earlier arrival
            else:
                heads.add(eid)
            n += 1
    state.update((json.dumps(sorted(heads)), json.dumps(sorted(pending)), n))
    yield pd.DataFrame(
        {"graph_key": [key[0]], "heads": [sorted(heads)], "n_events": [n]}
    )


def streaming_head_tracker(stream: DataFrame) -> DataFrame:
    """Maintain the esvc head antichain incrementally per graph key.
    Input schema: (graph_key STRING, event_id, ts, deps_json STRING —
    JSON array of dep event ids). Emits the current minimized head set
    after each micro-batch (≙ append_head + compaction, main.rs:217-250,
    but incremental instead of whole-set re-minimization). The fold is
    order-independent (see `pending` in `_heads_fn`): the final head set
    is exactly {arrived ids never named as any arrived event's dep}
    regardless of delivery order."""
    return stream.groupBy("graph_key").applyInPandasWithState(
        _heads_fn,
        HEADS_SCHEMA,
        _HEADS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
