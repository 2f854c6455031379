"""Census: per-query count of parquet Scan nodes per base table and
InMemoryRelation count, from the formatted plan at sf0.001 (plan-only,
no execution). Flags queries re-scanning one table >= 3x.

Usage: python scripts/scan_census.py [--sf-dir DIR]
(paths derived from the repo layout — ADVICE r11, matching opt_probe.py)
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from esvc_spark.queries import all_queries
from esvc_spark.queries._util import release_between_queries
from esvc_spark.session import get_spark

_ap = argparse.ArgumentParser()
_ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
SF = _ap.parse_args().sf_dir
spark = get_spark("scan-census", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

SKIP_PREFIX = ("q_stream_",)  # streaming queries execute on construction
rows = []
for name, fn in all_queries().items():
    if name.startswith(SKIP_PREFIX) or name.startswith("q_esvc"):
        continue
    if name in ("q_emb_ivf_split", "q_emb_ivf_merge", "q_emb_ivfpq_store",
                "q_emb_ivf_plan", "q_emb_kcenter", "q_emb_mmr",
                "q_emb_shard_plan", "q_doc_dup_clusters", "q_doc_canonical",
                "q_doc_leakage_split", "q_emb_dup_clusters",
                "q_doc_cross_source_dup", "q_emb_pq_train",
                "q_stream_emb_index", "q_doc_upsert"):
        continue  # imperative/iterative: executing or side-effectful
    try:
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    except Exception as e:
        print(f"ERR {name}: {type(e).__name__}", flush=True)
        release_between_queries(spark)
        continue
    scans = re.findall(r"/(\w+)\.parquet", plan)
    from collections import Counter
    c = Counter(scans)
    imr = len(re.findall(r"\(\d+\) InMemoryRelation", plan))
    worst = c.most_common(1)[0] if c else ("-", 0)
    if worst[1] >= 3:
        rows.append((worst[1], name, dict(c), imr))
    release_between_queries(spark)

for n, name, c, imr in sorted(rows, reverse=True):
    print(f"{n}x  {name}  scans={c}  inmem={imr}", flush=True)
spark.stop()
