"""SQL passthrough: the engine accepts raw ANSI SQL over the registered
testdata views (SURVEY.md §7 phase 1 deliverable) and agrees with the
DataFrame formulation of the same query."""

from __future__ import annotations

from esvc_spark.catalog import register_views
from esvc_spark.queries.relational import q06_forecast_revenue


def test_sql_matches_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    ).collect()[0]["revenue"]
    want = q06_forecast_revenue(spark, sf_dir).collect()[0]["revenue"]
    assert got == want


def test_sql_join_over_views(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]["n"]
    assert n == spark.table("orders").count()
