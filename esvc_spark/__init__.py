"""esvc_spark — a PySpark-native analytics engine with the capabilities of
fogti/esvc (event-sourcing version control) plus a relational / LLM-data-
pipeline operator surface designed for 100 TB scale.

Layout:
    session    — SparkSession factory tuned for the target scale
    catalog    — testdata table loaders / view registration
    queries    — the declared query surface (relational, events, documents,
                 embeddings) with DuckDB-oracle SQL equivalents
    core       — the esvc event-log core: content-addressed event DAG,
                 dependency inference by commutation testing, branch merge
    operators  — dedup / similarity / multimodal operators
    functions  — scalar/aggregate helpers (hashing, text, vectors)
    streaming  — Structured Streaming pipelines over the events stream
"""

__version__ = "0.1.0"


def release_cached() -> int:
    """Unpersist every intermediate the query library persisted. A
    long-lived host session should call this after materializing a query's
    result; unlike spark.catalog.clearCache() it never touches caches the
    host application owns."""
    from .queries._util import release_cached as _rc

    return _rc()
