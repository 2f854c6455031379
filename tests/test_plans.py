"""Plan-contract tests: pushdown, pruning, broadcast selection, and
shuffle counts for the headline queries. A regression here means a plan
that would fall over at cluster scale even if results stay correct."""

from __future__ import annotations

from esvc_spark.operators.temporal import asof_join
from esvc_spark.plans import codegen_stages, plan_stats
from esvc_spark.queries.relational import (
    q01_pricing_summary,
    q03_shipping_priority,
    q06_forecast_revenue,
)

SF = "/root/testdata/sf0.001"


def test_q06_pushdown_and_pruning(spark):
    st = plan_stats(q06_forecast_revenue(spark, SF))
    # all three predicates reach the parquet scan
    assert any("l_shipdate" in f for f in st["pushed_filters"])
    assert any("l_discount" in f for f in st["pushed_filters"])
    assert any("l_quantity" in f for f in st["pushed_filters"])
    # only the needed columns are read
    assert set(st["scan_columns"]) <= {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }
    assert st["shuffles"] == 0  # single global agg: partial + final, no hash shuffle
    assert st["nested_loop_joins"] == 0


def test_q03_broadcasts_dimensions(spark):
    st = plan_stats(q03_shipping_priority(spark, SF))
    assert st["broadcast_hash_joins"] >= 1  # customer side broadcast
    assert st["nested_loop_joins"] == 0
    assert codegen_stages(spark, lambda: q03_shipping_priority(spark, SF)) >= 1


def test_q01_partial_aggregation(spark):
    st = plan_stats(q01_pricing_summary(spark, SF))
    # map-side partial agg means exactly one shuffle (on the group keys)
    assert st["shuffles"] == 1
    assert any("l_shipdate" in f for f in st["pushed_filters"])


def test_asof_join_single_shuffle(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1))], "id INT, k INT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "k INT, ts TIMESTAMP, v DOUBLE"
    )
    st = plan_stats(asof_join(left, right, on="ts", by=["k"], value_cols=["v"]))
    # union + one window shuffle on the key; crucially no join node at all
    assert st["shuffles"] == 1
    assert st["sort_merge_joins"] == 0 and st["nested_loop_joins"] == 0


def test_sample_mixture_no_shuffle(spark):
    from esvc_spark.queries.documents import q_doc_sample_mixture

    st = plan_stats(q_doc_sample_mixture(spark, SF))
    # a pure narrow map: predicate + projection, nothing to shuffle
    assert st["shuffles"] == 0
    assert st["broadcasts"] == 0
    assert st["nested_loop_joins"] == 0


def test_tfidf_broadcasts_df_table(spark):
    from esvc_spark.queries.documents import q_doc_tfidf_top

    st = plan_stats(q_doc_tfidf_top(spark, SF))
    # the document-frequency table (vocabulary-sized) must broadcast;
    # a sort-merge join here would shuffle the full token explosion twice
    assert st["broadcast_hash_joins"] >= 1
    # tf filter restricts the per-doc side at the scan
    assert any("doc_id" in f for f in st["pushed_filters"])


def test_kmeans_assignment_never_sorts(spark):
    from esvc_spark.queries.embeddings import q_emb_kmeans

    st = plan_stats(q_emb_kmeans(spark, SF))
    # argmin is a struct-min hash aggregate, not a window rank: no
    # sort-merge join, and the only NLJs are the K-row broadcast cross
    # joins of the centroid side (one per assignment round, plus one the
    # session may plan for the tiny update-side aggregate)
    assert st["sort_merge_joins"] == 0
    assert st["nested_loop_joins"] <= 3


def test_contamination_broadcasts_eval_set(spark):
    from esvc_spark.queries.documents import q_doc_contamination

    st = plan_stats(q_doc_contamination(spark, SF))
    # the eval shingle set must broadcast (semi-join); shuffling the
    # corpus side against it would be the 100 TB failure mode
    assert st["broadcasts"] >= 1
    assert st["sort_merge_joins"] == 0


def test_cms_sketch_broadcasts(spark):
    from esvc_spark.queries.events import q_ev_cms_heavy

    st = plan_stats(q_ev_cms_heavy(spark, SF))
    # the d*w-cell sketch is constant-size and must broadcast to the
    # probe side
    assert st["broadcast_hash_joins"] >= 1
    assert st["nested_loop_joins"] == 0


def test_stream_confs_restored(spark):
    import pyspark.sql.functions as F  # noqa: F401

    from esvc_spark.queries import events as ev

    before = spark.conf.get("spark.sql.shuffle.partitions")
    for fn in (
        ev.q_stream_tumbling_hourly,
        ev.q_stream_sessionize,
        ev.q_stream_join,
        ev.q_stream_dedup,
        ev.q_stream_running_totals,
    ):
        fn(spark, SF).count()
        # the bounded-stream state-partition cap must not leak into the
        # session's batch configuration
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == before
        ), fn.__name__


def test_partition_prune_one_day(spark, tmp_path):
    """The q_part_prune_audit layout: a day-partitioned write read back
    with a literal day filter must prune to exactly one partition
    directory (PartitionFilters, not a post-scan Filter)."""
    from pyspark.sql import functions as F

    from esvc_spark.catalog import table as T

    ev = T(spark, SF, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(path)
    target = ev.agg(F.date_add(F.min("day"), 2)).collect()[0][0]
    pruned = spark.read.parquet(path).filter(F.col("day") == F.lit(target))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    # live proof: the scan reads exactly the one day's files
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert files and all(f"day={target}" in r[0] for r in files)


def test_bucketed_join_no_exchange(spark, tmp_path):
    """The q_bucket_join_audit layout: both sides written bucketed on the
    join key -> SortMergeJoin with ZERO exchanges (bucket-to-bucket)."""
    from pyspark.sql import functions as F

    from esvc_spark.catalog import table as T

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for name, tbl, key in (
            ("tbja_orders", "orders", "o_custkey"),
            ("tbja_customer", "customer", "c_custkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                T(spark, SF, tbl)
                .write.mode("overwrite")
                .option("path", str(tmp_path / name))
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("tbja_orders")
        c = spark.table("tbja_customer")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_mktsegment"
        )
        st = plan_stats(joined)
        assert st["sort_merge_joins"] == 1
        assert st["shuffles"] == 0  # bucket-to-bucket: no exchange either side
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for name in ("tbja_orders", "tbja_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
