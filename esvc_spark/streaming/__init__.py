from .pipelines import (
    dedup_stream,
    ingest_into_event_log,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    tumbling_stream,
)

__all__ = [
    "read_events_stream",
    "tumbling_stream",
    "sessionize_stream",
    "dedup_stream",
    "ingest_into_event_log",
    "run_to_memory",
]
