"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship query (smoke check at sf0.001)
queries()        — every implemented query/operator from SURVEY.md §2
oracle_sql()     — DuckDB-equivalent SQL per query (correctness gate)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-style join + agg
    + top-k (exercises scans, broadcast + shuffle joins, exact decimal
    aggregation, ordering)."""
    from esvc_spark.queries.relational import q03_shipping_priority

    return q03_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from esvc_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from esvc_spark.queries import all_oracles

    return all_oracles()
