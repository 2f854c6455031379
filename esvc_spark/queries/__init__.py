"""The declared query surface.

Each submodule exposes two dicts:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]       # DuckDB-runnable ANSI SQL (may omit keys
                                  # for non-SQL-expressible operators)

`all_queries()` / `all_oracles()` merge them for __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import documents, embeddings, esvc, events, multimodal, relational

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, events, documents, embeddings, multimodal, esvc):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import documents, embeddings, esvc, events, multimodal, relational

    merged: dict[str, str] = {}
    for mod in (relational, events, documents, embeddings, multimodal, esvc):
        merged.update(mod.ORACLES)
    return merged
