"""Physical-plan inspection: the feedback loop for shuffle/pushdown/
broadcast hygiene. Tests assert on these properties so a regression that
turns a broadcast join into a shuffle join, or un-pushes a parquet
filter, fails CI — the plan contract matters as much as the result at
cluster scale, where one stray Exchange over 100 TB is the whole budget.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def codegen_stages(spark, build) -> int:
    """Number of whole-stage-codegen subtrees for the plan `build()`
    produces. AQE hides codegen info until runtime finalization, so the
    plan is (re)built with AQE off just for this measurement."""
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        head = explain_str(build(), "codegen").splitlines()[:3]
        for line in head:
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees", line)
            if m:
                return int(m.group(1))
        return 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def plan_stats(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale:

    - shuffles: every `Exchange` (hashpartitioning) — each is a full
      materialize + network pass of its input;
    - broadcasts: `BroadcastExchange`s — small sides shipped to every
      executor instead of shuffling the big side;
    - sort_merge_joins / broadcast_hash_joins: join strategy actually
      chosen by Catalyst (+AQE);
    - pushed_filters: predicates that reached the parquet scan;
    - scan_columns: columns actually read (column pruning evidence);
    - codegen_stages: whole-stage-codegen spans (JVM-compiled pipelines).
    """
    s = explain_str(df, "formatted")  # detail section: filters/schema
    t = explain_str(df, "simple")  # one-line nodes: joins/exchanges/codegen
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", s):
        if m.group(1).strip():
            pushed.extend(p.strip() for p in m.group(1).split(","))
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    # the plan tree section of formatted mode lists every operator once
    tree = s.split("\n\n")[0]
    return {
        "shuffles": len(re.findall(r"\bExchange hashpartitioning", t)),
        # SinglePartition exchanges funnel their whole input through ONE
        # task — only acceptable over BOUNDED frames (value histograms,
        # top-k survivors, per-group reductions); PLANS.md surfaces the
        # count per query so the single-task story is auditable
        "single_partition": len(
            re.findall(r"\bExchange SinglePartition", t)
        ),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", tree)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", tree)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", tree)),
        "nested_loop_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", tree)),
        "pushed_filters": pushed,
        "scan_columns": sorted(cols),
        "scans": len(re.findall(r"Scan parquet", tree)),
    }
