"""Event-stream analytics over the `events` table (event_id, ts, user_id,
event_type, value, props) — the batch expressions of the streaming
pipelines in esvc_spark.streaming (same window/session semantics;
Structured Streaming runs these incrementally with watermarks).

Every query has a DuckDB oracle. Time handling: session timezone is UTC,
so naive timestamps agree across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import dec, dsum, sql_dsum, tracked_persist as _tp

# ---------------------------------------------------------------- tumbling
# 1-hour tumbling windows per event type: the canonical streaming aggregate
# (streaming equivalent: groupBy(window('ts','1 hour'), ...) + watermark).


def q_ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


_TUMBLING_SQL = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

# ---------------------------------------------------------------- sessions
# 30-minute-gap sessionization per user (batch session_window; streaming
# equivalent uses the same session_window with a watermark). Oracle:
# classic gaps-and-islands. Spark closes a session when the next event is
# >= gap after the previous one, matching the `>=` in the oracle.


def q_ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "last_ts",
            "n_events",
            "sum_value",
        )
    )


_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes' OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
       COUNT(*) AS n_events, {sql_dsum('value', 2)} AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""

# ---------------------------------------------------------------- dedup
# Exact event dedup by content (streaming equivalent: dropDuplicates
# within the watermark); deterministic representative = earliest
# (ts, event_id).


def q_ev_dedup_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type", "value")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.struct("ts", "event_id")).getField("event_id").alias("first_event_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


_DEDUP_SQL = """
SELECT user_id, event_type, value, COUNT(*) AS n_copies,
       MIN(ROW(ts, event_id))[2] AS first_event_id
FROM events
GROUP BY user_id, event_type, value
HAVING COUNT(*) > 1
"""

# ---------------------------------------------------------------- JSON
# Scalar JSON extraction from the props column.


def q_ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
         / COUNT(CAST(props->>'$.k' AS BIGINT)) AS avg_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""

# ---------------------------------------------------------------- funnels
# Per-user first/last behavior via window functions over event time.


def q_ev_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w_asc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_asc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w_full).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
            F.count(F.lit(1)).over(w_full).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).over(w_full)
            .cast("double")
            .alias("total_value"),
        )
        .distinct()
    )


_JOURNEY_SQL = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type) OVER w AS last_type,
       COUNT(*) OVER w AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS total_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------- as-of join
# Attribution: each click joined to the user's most recent purchase at or
# before the click (esvc_spark.operators.temporal.asof_join — one shuffle
# + window, no inequality-join blowup). Oracle: DuckDB native ASOF JOIN.


def q_ev_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["purchase_value"]
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts AS pts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT event_id, clicks.user_id AS user_id, ts, purchase_value
FROM clicks ASOF LEFT JOIN purch
  ON clicks.user_id = purch.user_id AND clicks.ts >= purch.pts
"""

# ------------------------------------------------------------ nearest asof
# Nearest-direction as-of: each click matched to the CLOSEST purchase of
# the same user in either time direction (ties → backward), the variant
# sensor-fusion and attribution pipelines need when "most recent" is the
# wrong prior. operators.temporal.asof_nearest_join runs the asof union
# trick in both window directions — one shuffle, no inequality join; the
# oracle states the identical two-pass window algorithm (DuckDB's ASOF
# is backward-only, so the composition IS the reference semantics).


def q_ev_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_nearest_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("t_us"), "value")
        .groupBy("user_id", "t_us")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_nearest_join(
        clicks,
        purchases,
        on="t_us",
        by=["user_id"],
        value_cols=["purchase_value"],
    )
    return out.select(
        "event_id", "user_id", "t_us", "purchase_value",
        F.col("matched_on").alias("purchase_t_us"),
        F.abs(F.col("t_us") - F.col("matched_on")).alias("gap_us"),
        "direction",
    )


_ASOF_NEAREST_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS t_us
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS t_us,
         MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
u AS (
  -- (ts, value) travel as ONE struct (null for left rows) so IGNORE
  -- NULLS can never mix the nearest row's ts with another row's value —
  -- mirrors the _rrow struct in operators.temporal.asof_nearest_join
  SELECT user_id, t_us, event_id,
         CAST(NULL AS STRUCT(rts BIGINT, pv DOUBLE)) AS rrow, 1 AS side
  FROM clicks
  UNION ALL
  SELECT user_id, t_us, CAST(NULL AS BIGINT),
         struct_pack(rts := t_us, pv := purchase_value), 0
  FROM purch
),
w AS (
  SELECT *,
         (LAST_VALUE(rrow IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us, side
           ROWS UNBOUNDED PRECEDING)).pv AS b_v,
         (LAST_VALUE(rrow IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us, side
           ROWS UNBOUNDED PRECEDING)).rts AS b_ts,
         (FIRST_VALUE(rrow IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us, side DESC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)).pv AS f_v,
         (FIRST_VALUE(rrow IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us, side DESC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)).rts AS f_ts
  FROM u
)
SELECT event_id, user_id, t_us,
       CASE WHEN f_ts IS NULL
                 OR (b_ts IS NOT NULL AND (t_us - b_ts) <= (f_ts - t_us))
            THEN b_v ELSE f_v END AS purchase_value,
       CASE WHEN f_ts IS NULL
                 OR (b_ts IS NOT NULL AND (t_us - b_ts) <= (f_ts - t_us))
            THEN b_ts ELSE f_ts END AS purchase_t_us,
       abs(t_us - CASE WHEN f_ts IS NULL
                            OR (b_ts IS NOT NULL
                                AND (t_us - b_ts) <= (f_ts - t_us))
                       THEN b_ts ELSE f_ts END) AS gap_us,
       CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
            WHEN f_ts IS NULL
                 OR (b_ts IS NOT NULL AND (t_us - b_ts) <= (f_ts - t_us))
            THEN 'backward' ELSE 'forward' END AS direction
FROM w WHERE side = 1
"""

# ---------------------------------------------------------------- range join
# Click→purchase pairs of the same user within (1s, 5min]: bucketized
# equality join (operators.temporal.range_join) instead of the
# nested-loop plan a raw inequality join would get.


def q_ev_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    pairs = range_join(
        clicks, purchases, on="ts", by=["user_id"],
        lower_us=1_000_000, upper_us=300_000_000,
    )
    return pairs.select(
        "click_id",
        F.col("purchase_id_r").alias("purchase_id"),
        "user_id",
        F.col("_gap_us").alias("gap_us"),
    )


_RANGE_SQL = """
WITH c AS (SELECT event_id AS click_id, user_id, ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase')
SELECT click_id, purchase_id, c.user_id AS user_id,
       epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP) AS gap_us
FROM c JOIN p ON c.user_id = p.user_id
WHERE epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP)
      BETWEEN 1000000 AND 300000000
"""


# ------------------------------------------------------ audience overlap
# Sketch SET OPERATIONS: estimate the user-audience intersection of
# every event-type pair from per-type KMV sketches alone —
# est(A∩B) = est(A) + est(B) − est(A∪B), where the union sketch is just
# the k smallest of the two sketches' union (KMV's closure property).
# Audited against the exact intersection. This is how audience-overlap
# questions get answered at 100 TB without ever joining raw user sets:
# sketches are k rows per type, the pair lattice is |types|² tiny.

_AOV_K = 64
_AOV_SPACE = float(1 << 60)


def q_ev_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    dh = ev.select("event_type", h.alias("h")).distinct().transform(_tp)
    wt = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        dh.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _AOV_K)
        .drop("rn")
        .transform(_tp)
    )

    def est_from(df, keys):
        w = Window.partitionBy(*keys).orderBy("h")
        ranked = df.withColumn("rn", F.row_number().over(w))
        kth = ranked.filter(F.col("rn") == _AOV_K).select(
            *keys, F.col("h").alias("kth")
        )
        n = ranked.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_seen"))
        return n.join(kth, list(keys), "left").select(
            *keys,
            F.when(F.col("kth").isNull(), F.col("n_seen").cast("double"))
            .otherwise(
                F.lit(float(_AOV_K - 1))
                / (F.col("kth").cast("double") / F.lit(_AOV_SPACE))
            )
            .alias("est"),
        )

    singles = est_from(sketch, ["event_type"])
    ta = sketch.select(F.col("event_type").alias("type_a"), "h")
    tb = sketch.select(F.col("event_type").alias("type_b"), "h")
    pair_rows = (
        ta.join(tb.select("type_b").distinct(), F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", "h")
        .unionByName(
            tb.join(
                ta.select("type_a").distinct(), F.col("type_a") < F.col("type_b")
            ).select("type_a", "type_b", "h")
        )
        .distinct()
    )
    unions = est_from(pair_rows, ["type_a", "type_b"]).withColumnRenamed(
        "est", "est_union"
    )
    ea = singles.select(
        F.col("event_type").alias("type_a"), F.col("est").alias("est_a")
    )
    eb = singles.select(
        F.col("event_type").alias("type_b"), F.col("est").alias("est_b")
    )
    xa = dh.select(F.col("event_type").alias("type_a"), "h")
    xb = dh.select(F.col("event_type").alias("type_b"), "h")
    exact = (
        xa.join(xb, ["h"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_exact_overlap"))
    )
    return (
        unions.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_exact_overlap", F.lit(0)).cast("bigint").alias(
                "n_exact_overlap"
            ),
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_overlap"
            ),
        )
    )


_AOV_SQL = f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
sketch AS (
  SELECT event_type, h FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {_AOV_K}
),
singles AS (
  SELECT event_type,
         CASE WHEN MAX(CASE WHEN rn = {_AOV_K} THEN h END) IS NULL
              THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {float(_AOV_K - 1)}
                   / (CAST(MAX(CASE WHEN rn = {_AOV_K} THEN h END) AS DOUBLE)
                      / {_AOV_SPACE}) END AS est
  FROM (SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM sketch)
  GROUP BY event_type
),
pair_rows AS (
  SELECT DISTINCT a.event_type AS type_a, b.event_type AS type_b, x.h
  FROM (SELECT DISTINCT event_type FROM sketch) a
  JOIN (SELECT DISTINCT event_type FROM sketch) b ON a.event_type < b.event_type
  JOIN sketch x ON x.event_type IN (a.event_type, b.event_type)
),
unions AS (
  SELECT type_a, type_b,
         CASE WHEN MAX(CASE WHEN rn = {_AOV_K} THEN h END) IS NULL
              THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {float(_AOV_K - 1)}
                   / (CAST(MAX(CASE WHEN rn = {_AOV_K} THEN h END) AS DOUBLE)
                      / {_AOV_SPACE}) END AS est_union
  FROM (SELECT type_a, type_b, h,
               ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM pair_rows)
  GROUP BY type_a, type_b
),
exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_exact_overlap
  FROM dh a JOIN dh b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT u.type_a, u.type_b,
       CAST(COALESCE(e.n_exact_overlap, 0) AS BIGINT) AS n_exact_overlap,
       sa.est + sb.est - u.est_union AS est_overlap
FROM unions u
JOIN singles sa ON sa.event_type = u.type_a
JOIN singles sb ON sb.event_type = u.type_b
LEFT JOIN exact e ON e.type_a = u.type_a AND e.type_b = u.type_b
"""


# ------------------------------------------------------- KMV window merge
# The mergeability story: per-day KMV sketches (k smallest distinct
# user-hashes per type) merged over a trailing 7-day window by taking
# the k smallest of the union — the reason sketches exist at scale (a
# sliding distinct count without re-touching raw data), audited against
# the exact windowed distinct. If the union holds fewer than k hashes,
# every contributing day was complete, so the union IS exact — the
# fallback uses its size. One explode (×7) of sketch rows, never of raw
# events.

_KMVW_K = 32
_KMVW_DAYS = 7
_DAY_US = 86_400_000_000
_KMVW_SPACE = float(1 << 60)  # 15 hex digits of md5 = 60-bit hash space


def q_ev_kmv_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    dh = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
            h.alias("h"),
        )
        .distinct()
        .transform(_tp)
    )
    wd = Window.partitionBy("event_type", "day").orderBy("h")
    sketch = (
        dh.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _KMVW_K)
        .drop("rn")
    )
    bounds = dh.agg(F.max("day").alias("max_day"))
    merged = (
        sketch.withColumn(
            "out_day", F.explode(F.expr(f"sequence(day, day + {_KMVW_DAYS - 1})"))
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("out_day") <= F.col("max_day"))
        .select("event_type", "out_day", "h")
        .distinct()
    )
    wo = Window.partitionBy("event_type", "out_day").orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(wo))
    kth = ranked.filter(F.col("rn") == _KMVW_K).select(
        "event_type", "out_day", F.col("h").alias("kth_hash")
    )
    union_n = ranked.groupBy("event_type", "out_day").agg(
        F.count(F.lit(1)).alias("n_union")
    )
    exact = (
        dh.withColumn(
            "out_day", F.explode(F.expr(f"sequence(day, day + {_KMVW_DAYS - 1})"))
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("out_day") <= F.col("max_day"))
        .select("event_type", "out_day", "h")
        .distinct()
        .groupBy("event_type", "out_day")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = F.lit(float(_KMVW_K - 1)) / (
        F.col("kth_hash").cast("double") / F.lit(_KMVW_SPACE)
    )
    return (
        exact.join(union_n, ["event_type", "out_day"])
        .join(kth, ["event_type", "out_day"], "left")
        .select(
            "event_type",
            "out_day",
            "n_exact",
            F.when(F.col("kth_hash").isNull(), F.col("n_union").cast("double"))
            .otherwise(est)
            .alias("est_distinct"),
        )
        .withColumn(
            "rel_err",
            (F.col("est_distinct") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        )
    )


_KMVW_SQL = f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         epoch_us(ts::TIMESTAMP) // {_DAY_US} AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
sketch AS (
  SELECT event_type, day, h FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {_KMVW_K}
),
mx AS (SELECT MAX(day) AS max_day FROM dh),
merged AS (
  SELECT DISTINCT event_type, day + t.i AS out_day, h
  FROM sketch, unnest(range(0, {_KMVW_DAYS})) t(i), mx
  WHERE day + t.i <= mx.max_day
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, out_day ORDER BY h) AS rn
  FROM merged
),
kth AS (
  SELECT event_type, out_day, h AS kth_hash FROM ranked WHERE rn = {_KMVW_K}
),
un AS (
  SELECT event_type, out_day, COUNT(*) AS n_union FROM merged GROUP BY 1, 2
),
exact AS (
  SELECT event_type, out_day, COUNT(*) AS n_exact FROM (
    SELECT DISTINCT event_type, day + t.i AS out_day, h
    FROM dh, unnest(range(0, {_KMVW_DAYS})) t(i), mx
    WHERE day + t.i <= mx.max_day
  ) GROUP BY 1, 2
)
SELECT e.event_type, e.out_day, CAST(e.n_exact AS BIGINT) AS n_exact,
       CASE WHEN k.kth_hash IS NULL THEN CAST(u.n_union AS DOUBLE)
            ELSE {float(_KMVW_K - 1)} / (CAST(k.kth_hash AS DOUBLE) / {_KMVW_SPACE})
       END AS est_distinct,
       (CASE WHEN k.kth_hash IS NULL THEN CAST(u.n_union AS DOUBLE)
             ELSE {float(_KMVW_K - 1)} / (CAST(k.kth_hash AS DOUBLE) / {_KMVW_SPACE})
        END - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE) AS rel_err
FROM exact e
JOIN un u ON u.event_type = e.event_type AND u.out_day = e.out_day
LEFT JOIN kth k ON k.event_type = e.event_type AND k.out_day = e.out_day
"""


# ------------------------------------------------------------------- lift
# Market-basket association lift between event types co-occurring in the
# same (user, hour) basket: lift(a,b) = P(a,b)/(P(a)·P(b)) computed as
# the exact rational n_ab·N/(n_a·n_b) — PMI without the log, so the
# value is one IEEE division of exact integers (cross-engine identical).
# Shape: distinct baskets (one shuffle), then a self-join whose side is
# |baskets|×|types| with only ~types² output — never corpus-quadratic.


def q_ev_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    baskets = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
            "event_type",
        )
        .distinct()
        .transform(_tp)
    )
    nb_row = (
        baskets.select("user_id", "h")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    per_type = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = per_type.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = per_type.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(nb_row))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


_LIFT_SQL = """
WITH baskets AS (
  SELECT DISTINCT user_id, epoch_us(ts::TIMESTAMP) // 3600000000 AS h, event_type
  FROM events
),
nb AS (SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, h FROM baskets)),
per_type AS (SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab, ta.n AS n_a, tb.n AS n_b,
       CAST(nb.n_baskets AS BIGINT) AS n_baskets,
       CAST(n_ab * nb.n_baskets AS DOUBLE) / CAST(ta.n * tb.n AS DOUBLE) AS lift
FROM pairs
JOIN per_type ta ON ta.event_type = type_a
JOIN per_type tb ON tb.event_type = type_b
CROSS JOIN nb
"""


# ------------------------------------------------------------- RFM features
# User feature engineering: recency / frequency / monetary per user with
# quartile binning (ntile over a pinned total order — metric then
# user_id, so both engines tile identically) and a composed RFM segment
# label — the feature-store shape behind churn/LTV training sets. One
# aggregate + three window passes over the (small) per-user table.


def q_ev_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2).alias("monetary"),
    )
    wr = Window.orderBy("last_ts", "user_id")
    wf = Window.orderBy("n_events", "user_id")
    wm = Window.orderBy("monetary", "user_id")
    return per_user.select(
        "user_id",
        "last_ts",
        "n_events",
        "monetary",
        F.ntile(4).over(wr).cast("int").alias("r_quartile"),
        F.ntile(4).over(wf).cast("int").alias("f_quartile"),
        F.ntile(4).over(wm).cast("int").alias("m_quartile"),
        F.concat(
            F.ntile(4).over(wr).cast("string"),
            F.ntile(4).over(wf).cast("string"),
            F.ntile(4).over(wm).cast("string"),
        ).alias("rfm_segment"),
    )


_RFM_SQL = f"""
WITH per_user AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_events,
         {sql_dsum('value', 2)} AS monetary
  FROM events GROUP BY user_id
)
SELECT user_id, last_ts, n_events, monetary,
       NTILE(4) OVER (ORDER BY last_ts, user_id) AS r_quartile,
       NTILE(4) OVER (ORDER BY n_events, user_id) AS f_quartile,
       NTILE(4) OVER (ORDER BY monetary, user_id) AS m_quartile,
       CAST(NTILE(4) OVER (ORDER BY last_ts, user_id) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY n_events, user_id) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY monetary, user_id) AS VARCHAR)
         AS rfm_segment
FROM per_user
"""

# ---------------------------------------------------------------- resample
# Gap-filled time-series resample: the hourly count series per event
# type densified onto the full hour grid (missing hours = 0) with a
# trailing 3-hour moving average — the regularization step before any
# time-series model. The grid is integer epoch-hour arithmetic (exact
# both engines); the moving average is an integer window sum divided by
# the window row count (one IEEE division).


def q_ev_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    hours = ev.select(
        F.expr("unix_micros(ts) div 3600000000").alias("h"), "event_type"
    )
    counts = hours.groupBy("h", "event_type").agg(F.count(F.lit(1)).alias("c"))
    bounds = hours.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        bounds.select(F.explode(F.expr("sequence(h0, h1)")).alias("h"))
        .crossJoin(ev.select("event_type").distinct())
    )
    filled = grid.join(counts, ["h", "event_type"], "left").select(
        "h", "event_type", F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-2, 0)
    return filled.select(
        F.timestamp_micros(F.expr("h * 3600000000")).alias("ts_hour"),
        "event_type",
        "n_events",
        (
            F.sum("n_events").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("ma3"),
    )


_RESAMPLE_SQL = """
WITH hours AS (
  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h, event_type FROM events
),
counts AS (SELECT h, event_type, COUNT(*) AS c FROM hours GROUP BY 1, 2),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hours),
grid AS (
  SELECT t.i AS h, et.event_type
  FROM bounds, unnest(range(h0, h1 + 1)) t(i)
  CROSS JOIN (SELECT DISTINCT event_type FROM events) et
),
filled AS (
  SELECT g.h, g.event_type, CAST(COALESCE(c.c, 0) AS BIGINT) AS n_events
  FROM grid g LEFT JOIN counts c ON g.h = c.h AND g.event_type = c.event_type
)
SELECT make_timestamp(h * 3600000000) AS ts_hour, event_type, n_events,
       CAST(SUM(n_events) OVER w AS DOUBLE)
         / CAST(COUNT(*) OVER w AS DOUBLE) AS ma3
FROM filled
WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------------ change points
# Change detection on the gap-filled hourly series: per event type, the
# k hours with the largest absolute jump between the trailing-3h mean
# before and after the hour — a windows-only CUSUM-style detector on
# exact integer sums (the one IEEE step is the final mean difference).
# Composes the q_ev_resample grid; at scale this is two window passes
# over an already-aggregated series.

_CHG_K = 3


def q_ev_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    filled = q_ev_resample(spark, sf_dir).select(
        "ts_hour", "event_type", "n_events"
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("ts_hour")
        .rowsBetween(-3, -1)
    )
    wa = Window.partitionBy("event_type").orderBy("ts_hour").rowsBetween(0, 2)
    d = (
        filled.withColumn("sum_b", F.sum("n_events").over(wb))
        .withColumn("cnt_b", F.count(F.lit(1)).over(wb))
        .withColumn("sum_a", F.sum("n_events").over(wa))
        .withColumn("cnt_a", F.count(F.lit(1)).over(wa))
        .filter(F.col("cnt_b") == 3)  # full windows only
        .withColumn(
            "jump",
            F.abs(
                F.col("sum_a").cast("double") / F.col("cnt_a").cast("double")
                - F.col("sum_b").cast("double") / F.col("cnt_b").cast("double")
            ),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("jump"), F.asc("ts_hour")
    )
    return (
        d.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _CHG_K)
        .select(
            "event_type",
            "ts_hour",
            "n_events",
            "jump",
            F.col("rk").cast("int").alias("rk"),
        )
    )


_CHG_SQL = f"""
WITH filled AS (
  SELECT ts_hour, event_type, n_events FROM ({_RESAMPLE_SQL})
),
d AS (
  SELECT ts_hour, event_type, n_events,
         SUM(n_events) OVER wb AS sum_b, COUNT(*) OVER wb AS cnt_b,
         SUM(n_events) OVER wa AS sum_a, COUNT(*) OVER wa AS cnt_a
  FROM filled
  WINDOW wb AS (PARTITION BY event_type ORDER BY ts_hour
                ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
         wa AS (PARTITION BY event_type ORDER BY ts_hour
                ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
)
SELECT event_type, ts_hour, n_events, jump, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *,
         abs(CAST(sum_a AS DOUBLE) / cnt_a - CAST(sum_b AS DOUBLE) / cnt_b)
           AS jump,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(CAST(sum_a AS DOUBLE) / cnt_a
                                         - CAST(sum_b AS DOUBLE) / cnt_b) DESC,
                                     ts_hour ASC) AS rk
  FROM d WHERE cnt_b = 3
)
WHERE rk <= {_CHG_K}
"""


# ------------------------------------------------------ forecast baseline
# Seasonal-naive forecasting with MASE evaluation (Hyndman & Koehler
# 2006) on the gap-filled hourly series: predict each of the last
# _FC_EVAL_H hours as the count 24 hours earlier, scale its MAE by the
# in-sample naive-1 MAE — the standard sanity baseline any forecasting
# pipeline must beat, and the scale-free error metric to beat it by.
# Exact arithmetic: counts are integers, both MAEs are one integer-sum /
# count division, MASE one further division of those two doubles.
# Scale: composes the resample grid; two lag windows over the already-
# aggregated series + one bounded groupBy, single-row hmax broadcast.

_FC_PERIOD = 24
_FC_EVAL_H = 48


def q_ev_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    filled = q_ev_resample(spark, sf_dir).select(
        "ts_hour", "event_type", "n_events"
    )
    w = Window.partitionBy("event_type").orderBy("ts_hour")
    lagged = filled.withColumn(
        "y24", F.lag("n_events", _FC_PERIOD).over(w)
    ).withColumn("y1", F.lag("n_events", 1).over(w))
    bounds = filled.agg(F.max("ts_hour").alias("hmax"))
    in_eval = F.expr(f"ts_hour > hmax - INTERVAL {_FC_EVAL_H} HOURS")
    agg = (
        lagged.join(F.broadcast(bounds))  # single-row hmax cross join
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    in_eval & F.col("y24").isNotNull(),
                    F.abs(F.col("n_events") - F.col("y24")),
                )
            )
            .cast("bigint")
            .alias("ae_snaive"),
            F.count(
                F.when(in_eval & F.col("y24").isNotNull(), F.lit(1))
            ).alias("n_eval"),
            F.sum(
                F.when(
                    (~in_eval) & F.col("y1").isNotNull(),
                    F.abs(F.col("n_events") - F.col("y1")),
                )
            )
            .cast("bigint")
            .alias("ae_naive1"),
            F.count(
                F.when((~in_eval) & F.col("y1").isNotNull(), F.lit(1))
            ).alias("n_train"),
        )
    )
    m = agg.select(
        "event_type",
        "n_eval",
        "n_train",
        (F.col("ae_snaive").cast("double") / F.col("n_eval")).alias("mae_snaive"),
        (F.col("ae_naive1").cast("double") / F.col("n_train")).alias("mae_naive1"),
    )
    return m.withColumn(
        "mase",
        F.when(
            F.col("mae_naive1") > 0, F.col("mae_snaive") / F.col("mae_naive1")
        ).otherwise(F.lit(-1.0)),
    )


_FORECAST_SQL = f"""
WITH filled AS (
  SELECT ts_hour, event_type, n_events FROM ({_RESAMPLE_SQL})
),
lagged AS (
  SELECT ts_hour, event_type, n_events,
         LAG(n_events, {_FC_PERIOD}) OVER w AS y24,
         LAG(n_events, 1) OVER w AS y1
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_hour)
),
bounds AS (SELECT MAX(ts_hour) AS hmax FROM filled),
agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN ts_hour > hmax - INTERVAL {_FC_EVAL_H} HOUR
                        AND y24 IS NOT NULL
                       THEN abs(n_events - y24) END) AS BIGINT) AS ae_snaive,
         COUNT(CASE WHEN ts_hour > hmax - INTERVAL {_FC_EVAL_H} HOUR
                     AND y24 IS NOT NULL THEN 1 END) AS n_eval,
         CAST(SUM(CASE WHEN ts_hour <= hmax - INTERVAL {_FC_EVAL_H} HOUR
                        AND y1 IS NOT NULL
                       THEN abs(n_events - y1) END) AS BIGINT) AS ae_naive1,
         COUNT(CASE WHEN ts_hour <= hmax - INTERVAL {_FC_EVAL_H} HOUR
                     AND y1 IS NOT NULL THEN 1 END) AS n_train
  FROM lagged CROSS JOIN bounds GROUP BY event_type
),
m AS (
  SELECT event_type, n_eval, n_train,
         CAST(ae_snaive AS DOUBLE) / n_eval AS mae_snaive,
         CAST(ae_naive1 AS DOUBLE) / n_train AS mae_naive1
  FROM agg
)
SELECT event_type, n_eval, n_train, mae_snaive, mae_naive1,
       CASE WHEN mae_naive1 > 0 THEN mae_snaive / mae_naive1
            ELSE -1.0 END AS mase
FROM m
"""


# ------------------------------------------------------ histogram quantiles
# Mergeable approximate quantiles: a fixed-width histogram sketch (1024
# bins of 0.5 over value ∈ [0, 512)) whose per-type quantile estimate is
# the lower bound of the bin where the cumulative count crosses the
# ceil(p·n) rank — O(bins) state per group, mergeable by addition, the
# scale alternative to exact sort-based percentiles. Reported NEXT TO
# the exact percentile (audit style, like q_doc_minhash_audit): at 100 TB
# you run the sketch, and this query is the evidence for how much error
# that buys. Bin ids are floor(value·2) — one IEEE multiply both engines
# compute identically; rank targets are exact integer arithmetic.

_HQ_PS = [(50, "p50"), (90, "p90"), (99, "p99")]


def q_ev_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select("event_type", "value")
    binned = ev.withColumn("bin", F.floor(F.col("value") * 2).cast("bigint"))
    counts = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = counts.withColumn("cum", F.sum("c").over(w))
    totals = counts.groupBy("event_type").agg(F.sum("c").alias("n_events"))
    j = cum.join(totals, "event_type")
    ests = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n_events * {p} + 99) div 100"),
                F.col("bin"),
            )
        ).alias(f"bin_{name}")
        for p, name in _HQ_PS
    ]
    est = j.groupBy("event_type").agg(F.max("n_events").alias("n_events"), *ests)
    exact = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {p / 100})").alias(f"exact_{name}")
            for p, name in _HQ_PS
        ]
    )
    out = est.join(exact, "event_type")
    cols = [F.col("event_type"), F.col("n_events")]
    for _, name in _HQ_PS:
        cols.append((F.col(f"bin_{name}").cast("double") * 0.5).alias(f"est_{name}"))
        cols.append(F.col(f"exact_{name}"))
    return out.select(*cols)


def _hq_sql() -> str:
    est_cols = ", ".join(
        f"MIN(CASE WHEN cum >= (n_events * {p} + 99) // 100 THEN bin END) AS bin_{name}"
        for p, name in _HQ_PS
    )
    exact_cols = ", ".join(
        f"quantile_cont(value, {p / 100}) AS exact_{name}" for p, name in _HQ_PS
    )
    sel = ", ".join(
        f"CAST(bin_{name} AS DOUBLE) * 0.5 AS est_{name}, exact_{name}"
        for _, name in _HQ_PS
    )
    return f"""
WITH binned AS (
  SELECT event_type, value, CAST(floor(value * 2) AS BIGINT) AS bin FROM events
),
counts AS (
  SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n_events
  FROM counts
),
est AS (
  SELECT event_type, CAST(MAX(n_events) AS BIGINT) AS n_events, {est_cols}
  FROM cum GROUP BY event_type
),
exact AS (SELECT event_type, {exact_cols} FROM events GROUP BY event_type)
SELECT e.event_type, e.n_events, {sel}
FROM est e JOIN exact USING (event_type)
"""


# ------------------------------------------------------------ attribution
# Multi-touch attribution with linear time decay: every click landing
# 1 s..300 s before a same-user purchase gets integer weight
# 301 - gap_seconds, normalized to a share of that purchase's credit —
# the marketing-analytics sibling of the funnel/as-of family. Exact
# integer weights + one IEEE division keep both engines bit-identical;
# the pair generation reuses the bucketized bounded range join (no
# inequality NLJ), and the normalization is one window sum over the
# (small) pair set.


def q_ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.temporal import range_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    pairs = range_join(
        clicks, purchases, on="ts", by=["user_id"],
        lower_us=1_000_000, upper_us=300_000_000,
    ).select(
        "click_id",
        F.col("purchase_id_r").alias("purchase_id"),
        "user_id",
        F.expr("301 - _gap_us div 1000000").cast("bigint").alias("weight"),
    )
    total = Window.partitionBy("purchase_id")
    return pairs.select(
        "purchase_id",
        "click_id",
        "user_id",
        "weight",
        (
            F.col("weight").cast("double")
            / F.sum("weight").over(total).cast("double")
        ).alias("credit_share"),
    )


_ATTRIBUTION_SQL = """
WITH c AS (SELECT event_id AS click_id, user_id, ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT purchase_id, click_id, c.user_id AS user_id,
         CAST(301 - (epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP))
                    // 1000000 AS BIGINT) AS weight
  FROM c JOIN p ON c.user_id = p.user_id
  WHERE epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP)
        BETWEEN 1000000 AND 300000000
)
SELECT purchase_id, click_id, user_id, weight,
       CAST(weight AS DOUBLE)
         / CAST(SUM(weight) OVER (PARTITION BY purchase_id) AS DOUBLE)
         AS credit_share
FROM pairs
"""


# ---------------------------------------------------------------- percentiles
# Exact distribution stats per event type: Spark's exact `percentile`
# (sort-based, not the t-digest approx) matches DuckDB quantile_cont
# bit-for-bit since both linearly interpolate over the sorted values.


def q_ev_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


_PCT_SQL = """
SELECT event_type, COUNT(*) AS n,
       quantile_cont(value, 0.5)  AS p50,
       quantile_cont(value, 0.9)  AS p90,
       quantile_cont(value, 0.99) AS p99,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY event_type
"""




# ---------------------------------------------------- streaming (oracle)
# The SAME tumbling aggregate executed through Structured Streaming: the
# events parquet is consumed as a file-stream source, aggregated with
# groupBy(window(...)) in complete output mode into a memory sink, and
# the sink table is returned. Complete-mode aggregation over a bounded
# stream is deterministic and equals the batch aggregate, so this is the
# rare streaming operator with a full value-level SQL oracle — driver-
# grade attestation that the streaming path computes the batch answer.
# (count_distinct is unsupported in streaming aggs, so the measure set is
# count + decimal sum.) At scale the same topology runs unbounded with a
# watermark (see esvc_spark.streaming.pipelines.tumbling_stream).

_STREAM_SEQ = [0]


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _bounded_stream_confs(spark: SparkSession):
    """Cap state-store partitions while a bounded contract stream runs:
    every stateful streaming operator spawns shuffle.partitions state
    tasks per micro-batch, and a plain driver session defaults to 200 —
    pure task-scheduling latency on a one-batch bounded stream (measured
    ~2-4x of these queries' wall time). Restored afterwards so batch
    queries on the same session keep their own sizing; an unbounded
    production deployment sizes state partitions to key cardinality
    instead (see esvc_spark.streaming.pipelines)."""
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file-stream source needs a directory basePath; a glob that
    # matches the single file keeps the parent dir as base
    stream = _event_stream(spark, sf_dir)
    agg = stream.groupBy(
        F.window("ts", "1 hour").start.alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2).alias("sum_value"),
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_tumbling_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


_STREAM_TUMBLING_SQL = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS sum_value
FROM events
GROUP BY 1, 2
"""



def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows through Structured Streaming (complete mode, same
    memory-sink pattern as q_stream_tumbling_hourly): attests that
    streaming sessionization computes the identical gaps-and-islands
    answer as the batch session_window / recursive-window oracle."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "last_ts",
            "n_events",
            "sum_value",
        )
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_sessionize_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def _event_stream(spark: SparkSession, sf_dir: str):
    """File-stream source over the events parquet (shared setup for the
    q_stream_* family): schema pinned from the batch footer, directory-glob
    basePath, ts normalized to TIMESTAMP µs whatever the file's physical
    type (catalog.normalize_event_ts) — all self-sufficient on a plain
    session."""
    import os

    from ..catalog import normalize_event_ts, set_events_read_confs

    set_events_read_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(sf_dir, "events.parque*"))
    )
    return normalize_event_ts(stream)


def _click_purchase_streams(spark: SparkSession, sf_dir: str):
    """The watermarked click/purchase stream pair shared by the inner
    (q_stream_join) and left-outer (q_stream_left_join) interval joins —
    one builder so delay/bounds/aliases cannot drift between the two."""
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    return clicks, purchases


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to same-user purchases
    landing 1 s..300 s later, both sides watermarked so the state store
    evicts rows older than the horizon — the unbounded-safe topology.
    Inner interval joins emit eagerly, so over a bounded stream the result
    equals the batch range join and shares q_ev_range_pairs' oracle
    semantics (driver-grade attestation of the stream-stream join path)."""
    clicks, purchases = _click_purchase_streams(spark, sf_dir)
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND "
            "p_ts >= c_ts + INTERVAL 1 SECOND AND "
            "p_ts <= c_ts + INTERVAL 300 SECOND"
        ),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_join_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics q_stream_join
    cannot show: a click with no same-user purchase 1 s..300 s later emits
    a null-padded row once the watermark passes its join horizon. Matched
    pairs emit eagerly; unmatched clicks emit exactly when
    c_ts + 300 s < final watermark, where the final watermark is
    ms_floor(min(max click ts, max purchase ts)) − 1 h (two watermarked
    sides, min policy; each side's watermark tracks its own filtered
    stream because the type filter precedes withWatermark; Spark floors
    event-time watermarks to milliseconds and the oracle mirrors that). On a bounded stream the tail
    of unmatched clicks inside the final horizon stays in state by DESIGN
    — and the DuckDB oracle encodes exactly that eviction rule, so the
    driver hash-checks the real outer-join watermark semantics, tail
    retention included. Scale shape: identical to q_stream_join (bounded
    watermarked state, no corpus-sized anything)."""
    clicks, purchases = _click_purchase_streams(spark, sf_dir)
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND "
            "p_ts >= c_ts + INTERVAL 1 SECOND AND "
            "p_ts <= c_ts + INTERVAL 300 SECOND"
        ),
        "leftOuter",
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        F.when(F.col("purchase_id").isNotNull(), 1).otherwise(0)
        .alias("matched"),
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_left_join_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


# The oracle states the outer-join eviction rule explicitly: every
# matched pair, plus null-padded rows ONLY for clicks whose join horizon
# (c_ts + 300 s) lies strictly before the final watermark
# min(max c_ts, max p_ts) − 1 h. (A microsecond-exact tie between a
# horizon and the watermark would make strictness observable; the
# synthetic timestamps make that measure-zero.)
_STREAM_LEFT_JOIN_SQL = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts::TIMESTAMP AS c_ts
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts::TIMESTAMP AS p_ts
  FROM events WHERE event_type = 'purchase'
),
wmf AS (
  -- Spark floors event-time watermarks to MILLISECONDS
  -- (EventTimeWatermarkExec tracks max event time in ms), so the
  -- eviction cutoff must be ms-floored here too or a click whose
  -- horizon lands in the sub-ms gap diverges between engines
  SELECT (LEAST((SELECT MAX(epoch_us(c_ts)) FROM clicks),
                (SELECT MAX(epoch_us(p_ts)) FROM purch)) // 1000
          - 3600000) * 1000 AS wm_us
)
SELECT c.click_id, c.user_id, p.purchase_id,
       CASE WHEN p.purchase_id IS NULL THEN NULL
            ELSE epoch_us(p.p_ts) - epoch_us(c.c_ts) END AS gap_us,
       CASE WHEN p.purchase_id IS NULL THEN 0 ELSE 1 END AS matched
FROM clicks c LEFT JOIN purch p
  ON p.user_id = c.user_id
 AND p.p_ts >= c.c_ts + INTERVAL 1 SECOND
 AND p.p_ts <= c.c_ts + INTERVAL 300 SECOND
WHERE p.purchase_id IS NOT NULL
   OR epoch_us(c.c_ts) + 300000000 < (SELECT wm_us FROM wmf)
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: dropDuplicatesWithinWatermark
    on the content key evicts dedup state past the horizon. Over the
    bounded one-batch stream every duplicate falls inside the horizon, so
    the append-mode output equals batch SELECT DISTINCT — a value-level
    oracle for the streaming dedup path (the unbounded topology is
    esvc_spark.streaming.pipelines.dedup_stream)."""
    stream = _event_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = stream.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "value"]
    ).select("user_id", "event_type", "value")
    _STREAM_SEQ[0] += 1
    name = f"stream_dedup_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


_STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type, value FROM events
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined to the
    static `customer` dimension (broadcast — the dim rides to every
    executor once; no stream-side state, no shuffle of the stream), then
    a windowless streaming aggregate per market segment in complete mode.
    This is the canonical unbounded-safe dimension-enrichment topology;
    over the bounded stream it equals the batch join+aggregate, giving
    the stream-static join path a full value-level oracle."""
    from ..catalog import table as T

    stream = _event_stream(spark, sf_dir)
    cust = F.broadcast(
        T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    enriched = stream.join(cust, stream.user_id == cust.c_custkey, "inner")
    # (count_distinct is unsupported in streaming aggs — count + exact
    # decimal sum, like q_stream_tumbling_hourly)
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2).alias("sum_value"),
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_enrich_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


_STREAM_ENRICH_SQL = f"""
SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: the 5 highest-volume users by event count through
    a complete-mode streaming aggregate with sorted, limited output —
    the leaderboard topology (sorting is only legal in complete mode,
    which is exactly what this attests). Deterministic tiebreak on
    user_id; exact decimal value sum."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(5)
    )
    _STREAM_SEQ[0] += 1
    name = f"stream_topk_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


_STREAM_TOPK_SQL = f"""
SELECT user_id, COUNT(*) AS n_events, {sql_dsum('value', 2)} AS sum_value
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 5
"""


def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly flagging — the live-monitoring topology: only
    the hourly counting runs in the stream (tumbling window, complete
    mode); the per-type baseline (mean/σ from exact integer moment sums)
    is a precomputed static dimension broadcast onto the streamed counts.
    On a real cluster the baseline refreshes out-of-band while the stream
    only ever shuffles window counts. Over the bounded stream the flagged
    set equals the batch q_ev_anomaly exactly, giving the topology a full
    value-level oracle (shared: _ANOMALY_SQL)."""
    stream = _event_stream(spark, sf_dir)
    agg = stream.groupBy(
        F.window("ts", "1 hour").start.alias("hr"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    _STREAM_SEQ[0] += 1
    name = f"stream_anomaly_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    hourly = spark.table(name)
    # the memory-sink view resolves to one set of attribute ids, so the
    # hourly⋈stats self-join needs the stats key re-aliased or analysis
    # sees "conflicting attributes"
    stats = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n").alias("s"),
            F.sum(F.col("n") * F.col("n")).alias("sq"),
        )
        .withColumnRenamed("event_type", "et")
    )
    enriched = hourly.join(
        F.broadcast(stats), hourly["event_type"] == stats["et"]
    ).select(
        "hr",
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("cnt")).alias("mean"),
        F.sqrt(
            F.col("sq").cast("double") / F.col("cnt")
            - (F.col("s").cast("double") / F.col("cnt"))
            * (F.col("s").cast("double") / F.col("cnt"))
        ).alias("std"),
    )
    return enriched.filter(
        F.abs(F.col("n").cast("double") - F.col("mean"))
        > F.lit(_ANOM_SIGMA) * F.col("std")
    ).select(
        "hr",
        "event_type",
        "n",
        "mean",
        "std",
        ((F.col("n").cast("double") - F.col("mean")) / F.col("std")).alias("z"),
    )


def q_stream_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The esvc head-set antichain maintained incrementally in a stream
    (streaming/stateful.streaming_head_tracker — the streaming twin of
    append_head + compaction, ref crates/exvc/src/main.rs:217-250), under
    the driver contract. Events are sharded into 16 graph keys by id; an
    event depends on its key-predecessor (id-16) except every third
    generation, which starts a fresh chain — so the final head set per
    key is exactly the events never named as a later event's dependency,
    which a closed-form oracle can state. The tracker's fold is
    order-independent (pending-supersession state), so the oracle holds
    even when ts is not id-monotone (out-of-order delivery)."""
    from ..streaming.stateful import streaming_head_tracker

    ev = _event_stream(spark, sf_dir)
    has_dep = (F.col("event_id") >= 16) & (
        F.expr("(event_id div 16) % 3") != 0
    )
    stream = ev.select(
        (F.col("event_id") % 16).cast("string").alias("graph_key"),
        "event_id",
        "ts",
        F.when(
            has_dep,
            F.concat(F.lit('["'), (F.col("event_id") - 16).cast("string"), F.lit('"]')),
        )
        .otherwise(F.lit("[]"))
        .alias("deps_json"),
    )
    tracked = streaming_head_tracker(stream)
    _STREAM_SEQ[0] += 1
    name = f"stream_heads_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            tracked.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name).select(
        "graph_key",
        F.array_join("heads", ",").alias("heads_csv"),
        F.size("heads").cast("bigint").alias("n_heads"),
        "n_events",
    )


# head ⟺ never referenced as a later event's dep: its successor (id+16)
# is past the end of the log, or starts a fresh chain ((id+16) div 16 ≡ 0
# mod 3 — Spark's has_dep rule negated)
_STREAM_HEADS_SQL = """
WITH e AS (SELECT event_id, event_id % 16 AS gk FROM events),
mx AS (SELECT MAX(event_id) AS m FROM e),
heads AS (
  SELECT gk, event_id FROM e, mx
  WHERE event_id + 16 > m OR ((event_id + 16) // 16) % 3 = 0
),
agg AS (
  SELECT gk,
         array_to_string(list_sort(list(CAST(event_id AS VARCHAR))), ',') AS heads_csv,
         CAST(COUNT(*) AS BIGINT) AS n_heads
  FROM heads GROUP BY gk
),
cnt AS (SELECT gk, CAST(COUNT(*) AS BIGINT) AS n_events FROM e GROUP BY gk)
SELECT CAST(a.gk AS VARCHAR) AS graph_key, a.heads_csv, a.n_heads, c.n_events
FROM agg a JOIN cnt c ON a.gk = c.gk
"""


# -------------------------------------------------------- streaming ingest
# The event-log ingest pipeline under the oracle: the events stream is
# driven through streaming.pipelines.ingest_into_event_log (foreachBatch,
# append-only parquet log, idempotent by event_id anti-join — the
# streaming realization of Graph.ensure_event's content-identity
# get-or-insert, ref crates/esvc-core/src/graph.rs:132-155) TWICE, the
# second pass with a FRESH checkpoint so every micro-batch is re-delivered
# — the at-least-once redelivery a real source exhibits. If the
# idempotence anti-join ever regressed, every count in the final
# aggregate would double and the hash gate would fail.


def q_stream_ingest_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.pipelines import ingest_into_event_log

    work = tempfile.mkdtemp(prefix="esvc_ingest_")
    try:
        with _bounded_stream_confs(spark):
            for attempt in ("first", "redelivery"):
                ingest_into_event_log(
                    _event_stream(spark, sf_dir),
                    log_dir=work,
                    checkpoint_dir=os.path.join(work, f"ckpt_{attempt}"),
                )
            log = spark.read.parquet(os.path.join(work, "events_stream"))
            out = (
                log.groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.count_distinct("user_id").alias("n_users"),
                    F.bit_xor("event_id").alias("id_xor"),
                    dsum("value", 2).alias("sum_value"),
                )
                # tiny (one row per event type): materialize eagerly so the
                # temp log dir can be removed before returning
                .localCheckpoint()
            )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the log holds each DISTINCT event exactly once regardless of how many
# times the stream delivered it; event_id is the content address and is
# unique in the source, so the log ≡ the batch events table
_STREAM_INGEST_SQL = f"""
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(bit_xor(event_id) AS BIGINT) AS id_xor,
       {sql_dsum('value', 2)} AS sum_value
FROM (SELECT DISTINCT event_id, user_id, event_type, value FROM events)
GROUP BY event_type
"""


# ------------------------------------------------------------- path mining
# Frequent event paths: 3-step sequences per user (lead x2 over event
# time), counted corpus-wide with a deterministic top-10 — the sequence-
# pattern mining behind funnel discovery. One window + one aggregate +
# one windowed top-k.

_PATH_K = 10


def q_ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    counts = seq.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), "e1", "e2", "e3")
    return (
        counts.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rk") <= _PATH_K)
        .select("e1", "e2", "e3", "n", "rk")
    )


_TOP_PATHS_SQL = f"""
WITH seq AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT e1, e2, e3, COUNT(*) AS n FROM seq
  WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
)
SELECT e1, e2, e3, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS BIGINT) AS rk
FROM counts QUALIFY rk <= {_PATH_K}
"""


# ---------------------------------------------------------------- anomaly
# Volume-anomaly detection: hourly event counts per type flagged when
# they deviate more than 3 population-sigma from that type's mean — the
# monitoring/alerting aggregate a pipeline runs over its own telemetry.
# Mean and variance come from exact integer sums (count, sum, sum of
# squares) with one IEEE division/multiplication chain parenthesized
# identically in both engines; at scale this is two map-side-combined
# aggregates and a broadcast join of the per-type stats.

_ANOM_SIGMA = 3.0


def q_ev_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").start.alias("hr"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("sq"),
    )
    enriched = hourly.join(F.broadcast(stats), "event_type").select(
        "hr",
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("cnt")).alias("mean"),
        F.sqrt(
            F.col("sq").cast("double") / F.col("cnt")
            - (F.col("s").cast("double") / F.col("cnt"))
            * (F.col("s").cast("double") / F.col("cnt"))
        ).alias("std"),
    )
    return enriched.filter(
        F.abs(F.col("n").cast("double") - F.col("mean"))
        > F.lit(_ANOM_SIGMA) * F.col("std")
    ).select(
        "hr",
        "event_type",
        "n",
        "mean",
        "std",
        ((F.col("n").cast("double") - F.col("mean")) / F.col("std")).alias("z"),
    )


_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS hr, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS cnt, SUM(n) AS s, SUM(n * n) AS sq
  FROM hourly GROUP BY event_type
),
enriched AS (
  SELECT hr, hourly.event_type, n,
         CAST(s AS DOUBLE) / cnt AS mean,
         sqrt(CAST(sq AS DOUBLE) / cnt
              - (CAST(s AS DOUBLE) / cnt) * (CAST(s AS DOUBLE) / cnt)) AS std
  FROM hourly JOIN stats USING (event_type)
)
SELECT hr, event_type, n, mean, std,
       (CAST(n AS DOUBLE) - mean) / std AS z
FROM enriched
WHERE abs(CAST(n AS DOUBLE) - mean) > {_ANOM_SIGMA} * std
"""


# ------------------------------------------------------------- KMV sketch
# K-minimum-values distinct-count sketch over user_id per event type —
# the deterministic cousin of HyperLogLog (md5-derived hashes, so both
# engines compute the identical sketch; approx_count_distinct would never
# oracle-match). Estimator: (k-1) / U_k with U_k the k-th smallest hash
# normalized to [0,1). Two-phase k-min: per-(type, salt) partial k-min
# first (parallel, bounded state), then global k-min over the ≤ salt·k
# survivors — the same shape a 1000-executor job needs, since a single
# window over all distinct hashes of one type would funnel that type's
# whole hash set through one task. Exact distinct rides along for the
# relative-error column.

_KMV_K = 64
_KMV_SALTS = 16
_KMV_SPACE = float(1 << 60)


def q_ev_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    dh = ev.select("event_type", h.alias("h")).distinct().transform(_tp)
    w_salt = Window.partitionBy("event_type", "salt").orderBy("h")
    survivors = (
        dh.withColumn("salt", F.pmod(F.col("h"), F.lit(_KMV_SALTS)))
        .withColumn("rn", F.row_number().over(w_salt))
        .filter(F.col("rn") <= _KMV_K)
        .drop("salt", "rn")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("event_type", F.col("h").alias("kth_hash"))
    )
    exact = dh.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    est = (
        F.lit(float(_KMV_K - 1))
        / (F.col("kth_hash").cast("double") / F.lit(_KMV_SPACE))
    )
    return (
        exact.join(kth, "event_type", "left")
        .select(
            "event_type",
            "n_exact",
            "kth_hash",
            F.when(F.col("kth_hash").isNull(), F.col("n_exact").cast("double"))
            .otherwise(est)
            .alias("est_distinct"),
        )
        .withColumn(
            "rel_err",
            (F.col("est_distinct") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        )
    )


_KMV_SQL = f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM dh
),
kth AS (SELECT event_type, h AS kth_hash FROM ranked WHERE rn = {_KMV_K}),
exact AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM dh GROUP BY event_type)
SELECT e.event_type, e.n_exact, k.kth_hash,
       CASE WHEN k.kth_hash IS NULL THEN CAST(e.n_exact AS DOUBLE)
            ELSE CAST({_KMV_K - 1} AS DOUBLE)
                 / (CAST(k.kth_hash AS DOUBLE) / {_KMV_SPACE!r})
       END AS est_distinct,
       (CASE WHEN k.kth_hash IS NULL THEN CAST(e.n_exact AS DOUBLE)
             ELSE CAST({_KMV_K - 1} AS DOUBLE)
                  / (CAST(k.kth_hash AS DOUBLE) / {_KMV_SPACE!r})
        END - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE) AS rel_err
FROM exact e LEFT JOIN kth k USING (event_type)
"""



# --------------------------------------------------------------- funnel
# Ordered 3-step conversion funnel (view -> click -> purchase): first
# qualifying event per user per stage, each stage constrained to strictly
# after the previous stage's timestamp. Stage tables are per-user minima
# (shuffle on user_id, map-side combined); the final output is a single
# summary row. Time deltas are exact integer microseconds; the average is
# one IEEE division at the end so both engines agree bitwise.


def q_ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    pch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_users"))
    np_ = pch.agg(
        F.count(F.lit(1)).alias("n_purchase_users"),
        (
            F.sum(F.unix_micros("t_click") - F.unix_micros("t_view")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("avg_view_to_click_sec"),
        (
            F.sum(F.unix_micros("t_purchase") - F.unix_micros("t_click")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("avg_click_to_purchase_sec"),
    )
    return nv.crossJoin(nc).crossJoin(np_)


# -------------------------------------------------- funnel latency
# Step-latency distribution for completed view→click→purchase journeys:
# exact p50/p90/max of each hop, the SLO-style view of the funnel that
# q_ev_funnel's averages hide (skewed hop times look fine on average).
# Latencies are integer microseconds (unix_micros differences), so the
# exact interpolated percentile is a deterministic rational → one double.
# Scale: same three min-aggregates as the funnel; the latency table is
# |converted users| rows, tiny next to the event scan.


def q_ev_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    pch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = pch.select(
        (F.unix_micros("t_click") - F.unix_micros("t_view")).alias("vc"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias("cp"),
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_journeys"),
        (F.expr("percentile(vc, 0.5)") / F.lit(1000000.0)).alias("vc_p50_sec"),
        (F.expr("percentile(vc, 0.9)") / F.lit(1000000.0)).alias("vc_p90_sec"),
        (F.max("vc").cast("double") / F.lit(1000000.0)).alias("vc_max_sec"),
        (F.expr("percentile(cp, 0.5)") / F.lit(1000000.0)).alias("cp_p50_sec"),
        (F.expr("percentile(cp, 0.9)") / F.lit(1000000.0)).alias("cp_p90_sec"),
        (F.max("cp").cast("double") / F.lit(1000000.0)).alias("cp_max_sec"),
    )


_FUNNEL_LATENCY_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id, v.t_view),
p AS (SELECT e.user_id, c.t_view, c.t_click, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id, c.t_view, c.t_click),
lat AS (
  SELECT epoch_us(t_click::TIMESTAMP) - epoch_us(t_view::TIMESTAMP) AS vc,
         epoch_us(t_purchase::TIMESTAMP) - epoch_us(t_click::TIMESTAMP) AS cp
  FROM p
)
SELECT COUNT(*) AS n_journeys,
       quantile_cont(vc, 0.5) / 1000000.0 AS vc_p50_sec,
       quantile_cont(vc, 0.9) / 1000000.0 AS vc_p90_sec,
       CAST(MAX(vc) AS DOUBLE) / 1000000.0 AS vc_max_sec,
       quantile_cont(cp, 0.5) / 1000000.0 AS cp_p50_sec,
       quantile_cont(cp, 0.9) / 1000000.0 AS cp_p90_sec,
       CAST(MAX(cp) AS DOUBLE) / 1000000.0 AS cp_max_sec
FROM lat
"""


_FUNNEL_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id, v.t_view),
p AS (SELECT e.user_id, c.t_view, c.t_click, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id, c.t_view, c.t_click)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_users,
       CAST(COUNT(*) AS BIGINT) AS n_purchase_users,
       CAST(SUM(epoch_us(t_click) - epoch_us(t_view)) AS DOUBLE)
         / COUNT(*) / 1000000.0 AS avg_view_to_click_sec,
       CAST(SUM(epoch_us(t_purchase) - epoch_us(t_click)) AS DOUBLE)
         / COUNT(*) / 1000000.0 AS avg_click_to_purchase_sec
FROM p
"""



def q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming (applyInPandasWithState) under the
    driver contract: per-user lifetime totals over the bounded event
    stream. The single-file source yields one micro-batch, so the
    emitted state equals the batch aggregate and a value-level oracle
    applies: exact integer cents (one terminal round over the float sum,
    error << 0.5 cent) and max event time per user."""
    from ..streaming.stateful import running_user_totals

    totals = running_user_totals(_event_stream(spark, sf_dir))
    _STREAM_SEQ[0] += 1
    name = f"stream_running_{_STREAM_SEQ[0]}"
    with _bounded_stream_confs(spark):
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


_RUNNING_TOTALS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(value * 100)) AS BIGINT) AS value_cents,
       MAX(ts) AS last_ts
FROM events GROUP BY user_id
"""



# ------------------------------------------------------------- cohorts
# Weekly cohort retention: users grouped by first-seen week, counted by
# distinct activity in each later week offset. Two shuffles total (first
# -seen per user, then cohort x offset counts); the cohort dimension is
# derived, never joined — the standard retention matrix at any scale.


def q_ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    acts = ev.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
            / 7
        )
        .cast("bigint")
        .alias("week_offset"),
    )
    return (
        acts.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_COHORT_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
acts AS (
  SELECT e.user_id, f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) // 7 AS BIGINT)
           AS week_offset
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM acts GROUP BY cohort_week, week_offset
"""



# ------------------------------------------------------------- sliding
# 1-hour windows sliding every 15 minutes: each event lands in 4
# overlapping windows. Spark's window(slideDuration) explodes window
# membership before the aggregate (shuffle carries 4x rows — inherent to
# hop windows); the oracle rebuilds membership with an explicit
# range-unnest. Streaming runs the identical expression incrementally.


def q_ev_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
        )
    )


_SLIDING_SQL = f"""
WITH hopped AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - k * INTERVAL '15 minutes' AS window_start,
         event_type, value
  FROM events, unnest(range(0, 4)) t(k)
)
SELECT window_start, event_type, COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS sum_value
FROM hopped GROUP BY 1, 2
"""



def q_ev_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct: operators.skew.salted_distinct_count
    under the driver contract. Per event_type (a low-cardinality, hence
    hot, key), distinct users are counted via (key, salt-of-value)
    partials so no task ever assembles one key's whole distinct set —
    the decomposition a 1000-executor job needs when one key dominates.
    The oracle is the plain COUNT(DISTINCT): the decomposition is exact
    by construction (salt is a function of the value)."""
    from ..operators.skew import salted_distinct_count

    ev = T(spark, sf_dir, "events")
    return salted_distinct_count(ev, key="event_type", value="user_id").select(
        "event_type", F.col("n_distinct").cast("bigint").alias("n_distinct")
    )


_SALTED_DISTINCT_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


# ------------------------------------------------------- count-min sketch
# Count-min frequency sketch over user_id (depth 4 x width 512, md5-derived
# row hashes — identical in both engines), with per-key estimates for a
# fixed probe set and the exact counts alongside for the overcount column.
# The streaming-aggregation workhorse for heavy-hitter detection: the
# sketch build is one explode(d rows) + groupBy of at most d*w cells —
# constant-size state no matter how many events flow through — and
# estimation joins the d*w-cell sketch (broadcast) against the probe keys.

_CMS_D = 4
_CMS_W = 512
_CMS_PROBE_N = 15


def _cms_bucket(i: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{i}:"), F.col("user_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(_CMS_W))


def _sql_cms_bucket(i: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{i}:' || CAST(user_id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {_CMS_W}"
    )


def q_ev_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id")
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), _cms_bucket(i).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("rb")
    ).select("rb.row_i", "rb.bucket")
    sketch = cells.groupBy("row_i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    probes = ev.filter(F.col("user_id") < _CMS_PROBE_N)
    exact = probes.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    keyed = exact.select(
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), _cms_bucket(i).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("user_id", "n_exact", "rb.row_i", "rb.bucket")
    return (
        keyed.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").alias("est"))
        .withColumn("overcount", F.col("est") - F.col("n_exact"))
        .select("user_id", "n_exact", "est", "overcount")
    )


def _cms_sql() -> str:
    bucket_rows = " UNION ALL ".join(
        f"SELECT user_id, {i} AS row_i, {_sql_cms_bucket(i)} AS bucket FROM ev"
        for i in range(_CMS_D)
    )
    return f"""
WITH ev AS (SELECT user_id FROM events),
cells AS ({bucket_rows}),
sketch AS (SELECT row_i, bucket, COUNT(*) AS cnt
           FROM cells GROUP BY row_i, bucket),
exact AS (SELECT user_id, COUNT(*) AS n_exact FROM ev
          WHERE user_id < {_CMS_PROBE_N} GROUP BY user_id),
keyed AS (
  SELECT e.user_id, e.n_exact, c.row_i, c.bucket
  FROM exact e JOIN (SELECT DISTINCT * FROM cells) c USING (user_id)
)
SELECT user_id, n_exact, MIN(cnt) AS est, MIN(cnt) - n_exact AS overcount
FROM keyed JOIN sketch USING (row_i, bucket)
GROUP BY user_id, n_exact
"""


# ---------------------------------------------------------------- HLL
# Real HyperLogLog (m=64 registers) over user_id per event type, next to
# the exact count — raw estimator, no small-range correction (that needs
# ln(), which is not correctly rounded across engines; KMV above is the
# corrected-accuracy alternative). Register update is pure integer math:
# bucket = hash div 2^54, rho = leading zeros of the 54-bit remainder + 1
# computed as 55 - length(bin(rest)) (string length of the binary
# expansion — identical in both engines, no log2). The indicator sum
# folds 2^-rho in bucket order: each term is an exact power of two, but
# adding 2^-60 into a ~64 accumulator rounds, so order is pinned.
# Scale shape: constant 64-register state per group, map-side combined.

_HLL_M = 64  # registers (6-bit bucket index)
_HLL_REST_BITS = 54  # 60-bit hash minus 6 bucket bits
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # same literal in both engines


def q_ev_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # persist: the distinct hash table feeds both the register build and
    # the exact count (same pattern as the KMV sketch above)
    hashed = ev.select("event_type", h.alias("h")).distinct().transform(_tp)
    regs = (
        hashed.select(
            "event_type",
            F.expr(f"CAST(h div {1 << _HLL_REST_BITS} AS INT)").alias("bucket"),
            F.expr(
                f"CASE WHEN h % {1 << _HLL_REST_BITS} = 0 THEN {_HLL_REST_BITS + 1} "
                f"ELSE {_HLL_REST_BITS + 1} - length(bin(h % {1 << _HLL_REST_BITS})) END"
            ).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    ind = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.aggregate(
            F.expr("transform(array_sort(collect_list(struct(bucket, reg))), t -> pow(2.0, -t.reg))"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("present_sum"),
    )
    exact = hashed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    est = (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M * _HLL_M))
        / (F.col("present_sum") + (F.lit(_HLL_M) - F.col("n_present")).cast("double"))
    )
    return (
        exact.join(F.broadcast(ind), "event_type")
        .withColumn("est_hll", est)
        .withColumn(
            "rel_err",
            (F.col("est_hll") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        )
        .select("event_type", "n_exact", "est_hll", "rel_err")
    )


_HLL_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT event_type, CAST(h // {1 << _HLL_REST_BITS} AS INT) AS bucket,
         MAX(CASE WHEN h % {1 << _HLL_REST_BITS} = 0 THEN {_HLL_REST_BITS + 1}
                  ELSE {_HLL_REST_BITS + 1} - length(bin(h % {1 << _HLL_REST_BITS})) END)
           AS reg
  FROM hashed GROUP BY 1, 2
),
ind AS (
  SELECT event_type, COUNT(*) AS n_present,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(pow(2.0, -reg) ORDER BY bucket)),
                     (acc, x) -> acc + x) AS present_sum
  FROM regs GROUP BY event_type
),
exact AS (SELECT event_type, COUNT(*) AS n_exact FROM hashed GROUP BY event_type)
SELECT event_type, n_exact,
       CAST({_HLL_ALPHA!r} AS DOUBLE) * {float(_HLL_M * _HLL_M)!r}
         / (present_sum + CAST({_HLL_M} - n_present AS DOUBLE)) AS est_hll,
       (CAST({_HLL_ALPHA!r} AS DOUBLE) * {float(_HLL_M * _HLL_M)!r}
         / (present_sum + CAST({_HLL_M} - n_present AS DOUBLE)) - CAST(n_exact AS DOUBLE))
         / CAST(n_exact AS DOUBLE) AS rel_err
FROM exact JOIN ind USING (event_type)
"""


# --------------------------------------------------------- HLL union merge
# HLL's defining merge: register-wise MAX. Prefix unions over the
# alphabetically-ranked event types (types 1..k merged per row) show the
# estimate stays calibrated as sketches from different partitions merge
# — the exact op a 1000-executor rollup runs when per-partition HLL
# states combine. Audited per prefix against the exact distinct count;
# estimates use the same pinned-order pow(2,-reg) fold as
# q_ev_hll_distinct.


def q_ev_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = ev.select("event_type", h.alias("h")).distinct().transform(_tp)
    wt = Window.orderBy("event_type")
    ranks = (
        hashed.select("event_type")
        .distinct()
        .withColumn("rank", F.row_number().over(wt))
        # prefix bound derived from the data, not hardcoded: a new event
        # type must widen the prefixes on BOTH engines or fail loudly,
        # never silently diverge (sequence(rank, k) descends for rank>k).
        .withColumn("n_types", F.max("rank").over(Window.partitionBy()))
    )
    regs = (
        hashed.select(
            "event_type",
            F.expr(f"CAST(h div {1 << _HLL_REST_BITS} AS INT)").alias("bucket"),
            F.expr(
                f"CASE WHEN h % {1 << _HLL_REST_BITS} = 0 THEN {_HLL_REST_BITS + 1} "
                f"ELSE {_HLL_REST_BITS + 1} - length(bin(h % {1 << _HLL_REST_BITS})) END"
            ).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    pref = (
        regs.join(F.broadcast(ranks), "event_type")
        .withColumn("prefix_k", F.explode(F.expr("sequence(rank, n_types)")))
        .groupBy("prefix_k", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    ind = pref.groupBy("prefix_k").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.aggregate(
            F.expr(
                "transform(array_sort(collect_list(struct(bucket, reg))),"
                " t -> pow(2.0, -t.reg))"
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("present_sum"),
    )
    exact = (
        hashed.join(F.broadcast(ranks), "event_type")
        .withColumn("prefix_k", F.explode(F.expr("sequence(rank, n_types)")))
        .select("prefix_k", "h")
        .distinct()
        .groupBy("prefix_k")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M * _HLL_M))
        / (F.col("present_sum") + (F.lit(_HLL_M) - F.col("n_present")).cast("double"))
    )
    return (
        exact.join(F.broadcast(ind), "prefix_k")
        .withColumn("est_hll", est)
        .withColumn(
            "rel_err",
            (F.col("est_hll") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        )
        .select(
            F.col("prefix_k").cast("int").alias("prefix_k"),
            "n_exact",
            "est_hll",
            "rel_err",
        )
    )


_HLL_UNION_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
ranks AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS rank
  FROM (SELECT DISTINCT event_type FROM hashed)
),
regs AS (
  SELECT event_type, CAST(h // {1 << _HLL_REST_BITS} AS INT) AS bucket,
         MAX(CASE WHEN h % {1 << _HLL_REST_BITS} = 0 THEN {_HLL_REST_BITS + 1}
                  ELSE {_HLL_REST_BITS + 1} - length(bin(h % {1 << _HLL_REST_BITS})) END)
           AS reg
  FROM hashed GROUP BY 1, 2
),
pref AS (
  SELECT CAST(p AS INT) AS prefix_k, bucket, MAX(reg) AS reg
  FROM regs JOIN ranks USING (event_type),
       unnest(range(rank, (SELECT MAX(rank) + 1 FROM ranks))) t(p)
  GROUP BY 1, 2
),
ind AS (
  SELECT prefix_k, COUNT(*) AS n_present,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(pow(2.0, -reg) ORDER BY bucket)),
                     (acc, x) -> acc + x) AS present_sum
  FROM pref GROUP BY prefix_k
),
exact AS (
  SELECT prefix_k, COUNT(*) AS n_exact FROM (
    SELECT DISTINCT CAST(p AS INT) AS prefix_k, h
    FROM hashed JOIN ranks USING (event_type),
         unnest(range(rank, (SELECT MAX(rank) + 1 FROM ranks))) t(p)
  ) GROUP BY prefix_k
)
SELECT e.prefix_k, e.n_exact,
       CAST({_HLL_ALPHA!r} AS DOUBLE) * {float(_HLL_M * _HLL_M)!r}
         / (present_sum + CAST({_HLL_M} - n_present AS DOUBLE)) AS est_hll,
       (CAST({_HLL_ALPHA!r} AS DOUBLE) * {float(_HLL_M * _HLL_M)!r}
         / (present_sum + CAST({_HLL_M} - n_present AS DOUBLE))
        - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE) AS rel_err
FROM exact e JOIN ind USING (prefix_k)
"""


# ------------------------------------------------------------ bloom filter
# Deterministic Bloom filter over purchase user_ids (k=3 md5-derived
# hashes into m=1024 bits, stored as 16 bigint words via bit_or
# aggregation), probed with every distinct user to measure the actual
# false-positive rate against ground truth. Completes the sketch family
# (KMV = cardinality, count-min = frequency, Bloom = membership); the
# filter build is a constant-size bit_or aggregate and the probe side
# joins against 16 broadcast words.

_BF_K = 3
_BF_M = 1024  # bits
# 63 usable bits per signed-64 word: bit 63 would overflow DuckDB's
# checked left shift (and silently wrap in Spark)
_BF_WORDS = -(-_BF_M // 63)
_BF_ABSENT_OFFSET = 1_000_000  # shadow probe ids guaranteed non-member


def _bf_bit(i: int, col: str = "user_id", dialect: str = "spark") -> str:
    """Bit index of hash i — same md5-derived integer in both dialects
    (Spark parses hex via conv(); DuckDB via the '0x' string cast)."""
    if dialect == "spark":
        return (
            f"CAST(conv(substr(md5(concat('b{i}:', CAST({col} AS STRING))), "
            f"1, 15), 16, 10) AS BIGINT) % {_BF_M}"
        )
    return (
        f"CAST(('0x' || substr(md5('b{i}:' || CAST({col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {_BF_M}"
    )


def q_ev_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    # word w collects bit (b % 64) of every hash landing in word b div 64
    # (integer div — `/`+cast truncates in Spark but CAST(double) ROUNDS
    # in DuckDB, so both dialects use their integer-division operator)
    bits = members.select(
        *[F.expr(_bf_bit(i)).alias(f"b{i}") for i in range(_BF_K)]
    )
    for w in range(_BF_WORDS):
        ors = " | ".join(
            f"CASE WHEN CAST(b{i} div 63 AS INT) = {w} "
            f"THEN shiftleft(CAST(1 AS BIGINT), CAST(b{i} % 63 AS INT)) "
            f"ELSE CAST(0 AS BIGINT) END"
            for i in range(_BF_K)
        )
        bits = bits.withColumn(f"w{w}", F.expr(ors))
    filt = bits.agg(
        *[F.expr(f"bit_or(w{w})").alias(f"w{w}") for w in range(_BF_WORDS)]
    )
    # probe every real user plus an offset shadow set guaranteed absent,
    # so the false-positive rate is measured against true negatives
    real = ev.select("user_id").distinct()
    probes = real.union(
        real.select((F.col("user_id") + _BF_ABSENT_OFFSET).alias("user_id"))
    ).distinct()
    truth = members.withColumn("is_member", F.lit(True))
    probe_bits = probes.join(F.broadcast(filt)).select(
        "user_id",
        *[F.col(f"w{w}") for w in range(_BF_WORDS)],
        *[F.expr(_bf_bit(i)).alias(f"b{i}") for i in range(_BF_K)],
    )
    maybe = None
    for i in range(_BF_K):
        w_expr = " ".join(
            f"WHEN CAST(b{i} div 63 AS INT) = {w} THEN w{w}"
            for w in range(_BF_WORDS)
        )
        t = F.expr(
            f"(shiftright(CASE {w_expr} END, CAST(b{i} % 63 AS INT)) & 1) = 1"
        )
        maybe = t if maybe is None else (maybe & t)
    verdicts = probe_bits.withColumn("maybe", maybe).join(
        F.broadcast(truth), "user_id", "left"
    ).select(
        "user_id",
        "maybe",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("bigint").alias("n_members"),
        F.sum(F.when(F.col("maybe") & ~F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum(F.when(~F.col("maybe") & F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_negatives"),
    )


def _bloom_sql() -> str:
    bit_cols = ", ".join(
        f"{_bf_bit(i, dialect='duckdb')} AS b{i}" for i in range(_BF_K)
    )
    word_exprs = ", ".join(
        "bit_or(" + " | ".join(
            f"CASE WHEN CAST(b{i} // 63 AS INT) = {w} "
            f"THEN (CAST(1 AS BIGINT) << CAST(b{i} % 63 AS INT)) "
            f"ELSE CAST(0 AS BIGINT) END"
            for i in range(_BF_K)
        ) + f") AS w{w}"
        for w in range(_BF_WORDS)
    )
    tests = " AND ".join(
        "((CASE "
        + " ".join(f"WHEN CAST(b{i} // 63 AS INT) = {w} THEN w{w}" for w in range(_BF_WORDS))
        + f" END >> CAST(b{i} % 63 AS INT)) & 1) = 1"
        for i in range(_BF_K)
    )
    return f"""
WITH members AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
mbits AS (SELECT user_id, {bit_cols} FROM members),
filt AS (SELECT {word_exprs} FROM mbits),
probes AS (
  SELECT DISTINCT user_id FROM (
    SELECT user_id FROM events
    UNION ALL
    SELECT user_id + {_BF_ABSENT_OFFSET} FROM events
  )
),
pbits AS (SELECT user_id, {bit_cols} FROM probes),
verdicts AS (
  SELECT p.user_id, ({tests}) AS maybe,
         (m.user_id IS NOT NULL) AS is_member
  FROM pbits p CROSS JOIN filt
  LEFT JOIN members m ON m.user_id = p.user_id
)
SELECT COUNT(*) AS n_probes,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN maybe AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives,
       CAST(SUM(CASE WHEN NOT maybe AND is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_negatives
FROM verdicts
"""


# ---------------------------------------------------------------- pagerank
# PageRank over the event-type transition graph (3 power iterations,
# damping 0.85): the iterative-graph-algorithm pattern on Spark. The heavy
# work at scale is building the edge list — one window over (user_id, ts)
# and one aggregate; the rank loop itself runs on the tiny node/edge
# tables (joins on a broadcast-sized side), each iteration a new Catalyst
# plan built in the driver — no corpus data ever leaves the cluster.
# Determinism: transition probabilities are single IEEE divisions of exact
# counts; each iteration's per-node contribution sum is a sequential fold
# in src order (decimal rounding of full-precision doubles would sit at
# the ulp boundary where engines disagree), so both engines walk
# bit-identical rank vectors.

_PR_DAMP = 0.85
_PR_ITERS = 3


def q_ev_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    # edges/probabilities feed every iteration — persist the tiny table
    p = (
        edges.join(out, "src")
        .select("src", "dst", (F.col("cnt").cast("double") / F.col("out_cnt")).alias("p"))
        .transform(_tp)
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = nodes.join(n)  # single-row cross join: N reaches every node row
    ranks = base.select("node", (F.lit(1.0) / F.col("n_nodes")).alias("r"))
    for _ in range(_PR_ITERS):
        # every per-iteration table is node-cardinality (tiny): broadcast
        # them so the rank loop never sorts or shuffles
        contrib = p.join(
            F.broadcast(ranks.select(F.col("node").alias("src"), "r")), "src"
        ).select("dst", "src", (F.col("r") * F.col("p")).alias("c"))
        agg = contrib.groupBy("dst").agg(
            F.aggregate(
                F.expr("transform(array_sort(collect_list(struct(src, c))), t -> t.c)"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s")
        )
        ranks = base.join(F.broadcast(agg), base["node"] == agg["dst"], "left").select(
            "node",
            (
                (F.lit(1.0) - F.lit(_PR_DAMP)) / F.col("n_nodes")
                + F.lit(_PR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def _pagerank_sql() -> str:
    it = """
SELECT node,
       (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE)) / n_nodes
         + CAST({d} AS DOUBLE) * COALESCE(s, CAST(0.0 AS DOUBLE)) AS r
FROM nodes CROSS JOIN n LEFT JOIN (
  SELECT dst, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                       list(c ORDER BY src)),
                          (acc, x) -> acc + x) AS s
  FROM (SELECT dst, src, r * p AS c
        FROM p JOIN {prev} ON {prev}.node = p.src)
  GROUP BY dst
) agg ON agg.dst = nodes.node"""
    ctes = ",\n".join(
        f"r{i + 1} AS ({it.format(d=_PR_DAMP, prev=f'r{i}')})"
        for i in range(_PR_ITERS)
    )
    return f"""
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS cnt
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
outd AS (SELECT src, SUM(cnt) AS out_cnt FROM edges GROUP BY src),
p AS (SELECT src, dst, CAST(cnt AS DOUBLE) / out_cnt AS p
      FROM edges JOIN outd USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n_nodes AS r
       FROM nodes CROSS JOIN n),
{ctes}
SELECT node, r AS pagerank FROM r{_PR_ITERS}
"""


# --------------------------------------------------- incremental rollup
# Incremental aggregate maintenance: the materialized-rollup pattern
# where yesterday's aggregate TABLE merges with today's delta instead of
# rescanning history. The daily (day, event_type) states — count,
# decimal sum, min, max — are all MERGEABLE (count/sum add, min/max
# combine), so base ∪ delta → re-aggregate equals the from-scratch
# answer; the oracle computes FROM SCRATCH over all events, making the
# hash-match a proof of merge correctness. The cutoff (last 6 epoch-days
# = the delta) stands in for the daily incremental batch.
#
# Scale: this is the map-side-combine algebra made explicit — at 100 TB
# the base states are |days|·|types| rows read from storage, and only
# the delta scans raw events. Both sides here aggregate BEFORE the
# union, so the merge shuffles state rows, never raw history.

_INC_DELTA_DAYS = 6


def q_ev_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").withColumn(
        "day", F.expr("unix_micros(ts) div 86400000000")
    )
    cutoff = ev.agg((F.max("day") - _INC_DELTA_DAYS + 1).alias("c"))

    def states(side: DataFrame, tag: int) -> DataFrame:
        return side.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 2)).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.lit(tag).alias("is_delta"),
        )

    base = states(ev.join(F.broadcast(cutoff), ev.day < F.col("c")), 0)
    delta = states(ev.join(F.broadcast(cutoff), ev.day >= F.col("c")), 1)
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            F.sum(F.col("is_delta") * F.col("n")).cast("bigint")
            .alias("n_delta"),
        )
    )


_INC_AGG_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts::TIMESTAMP) // 86400000000 AS day, event_type, value
  FROM events
),
c AS (SELECT MAX(day) - {_INC_DELTA_DAYS} + 1 AS c FROM ev)
SELECT day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value', 2)} AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value,
       CAST(SUM(CASE WHEN day >= (SELECT c FROM c) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_delta
FROM ev GROUP BY day, event_type
"""

# ------------------------------------------------------- predictability
# Per-user behavioral predictability: the empirical entropy RATE of the
# event-type sequence — H(next | current) under the user's own
# transition counts, via the same exact fixed-point identity as
# q_doc_entropy: Σ_s [n_s·qlog2(n_s) − Σ_t c_st·qlog2(c_st)], all
# BIGINT, one final division to bits/transition. Low entropy = scripted
# or single-loop behavior (the complement of q_ev_bot_detect's timing
# signal); high = diverse organic usage. Users need ≥ 2 transitions.
#
# Scale: one lag window + two aggregates (per-(user,prev,next) counts,
# then per-user sums) — the q_doc_entropy shape keyed by user.


def q_ev_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _qlog2_expr

    ev = T(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr(
            "lag(event_type) over (partition by user_id order by ts, event_id)"
        ).alias("prev"),
        F.col("event_type").alias("cur"),
    ).where(F.col("prev").isNotNull())
    c = seq.groupBy("user_id", "prev", "cur").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_state = c.groupBy("user_id", "prev").agg(
        F.sum("c").cast("bigint").alias("ns"),
        F.sum(F.col("c") * F.expr(_qlog2_expr("c", "spark")))
        .cast("bigint")
        .alias("s1"),
    )
    return (
        per_state.withColumn(
            "hq",
            F.col("ns") * F.expr(_qlog2_expr("ns", "spark")) - F.col("s1"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("ns").cast("bigint").alias("n_transitions"),
            F.sum("hq").cast("bigint").alias("ent_q"),
        )
        .where(F.col("n_transitions") >= 2)
        .select(
            "user_id", "n_transitions", "ent_q",
            (F.col("ent_q").cast("double") / (F.col("n_transitions") * 16))
            .alias("bits_per_transition"),
        )
    )


def _predictability_sql() -> str:
    from .documents import _qlog2_expr

    qc = _qlog2_expr("c", "duckdb")
    qn = _qlog2_expr("ns", "duckdb")
    return f"""
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev,
         event_type AS cur
  FROM events QUALIFY prev IS NOT NULL
),
c AS (
  SELECT user_id, prev, cur, COUNT(*) AS c
  FROM seq GROUP BY 1, 2, 3
),
per_state AS (
  SELECT user_id, prev, CAST(SUM(c) AS BIGINT) AS ns,
         CAST(SUM(c * {qc}) AS BIGINT) AS s1
  FROM c GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(SUM(ns) AS BIGINT) AS n_transitions,
         CAST(SUM(ns * {qn} - s1) AS BIGINT) AS ent_q
  FROM per_state GROUP BY user_id
)
SELECT user_id, n_transitions, ent_q,
       CAST(ent_q AS DOUBLE) / (n_transitions * 16) AS bits_per_transition
FROM per_user WHERE n_transitions >= 2
"""


# ---------------------------------------------------------------- gini
# Activity concentration: the exact Gini coefficient of per-user event
# counts, G = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n over counts ranked
# ascending (ties pinned by user_id) — the one-number answer to "is
# this product used by everyone or by ten whales?", and the
# concentration diagnosis behind sampling and skew decisions. All
# integer until two final divisions.
#
# Scale: one per-user aggregate + one ranking window over |users| rows;
# the weighted sum is a single aggregate. Output is one row. BIGINT
# bound: wsum ≤ n_users·total_events, safe while that product stays
# under 2^63 (~1e9 users × 1e9 events); beyond that switch wsum and the
# denominator to DECIMAL(38,0) — the q_ev_bot_detect escalation rule.


def q_ev_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy("x", "user_id")
    ranked = per.withColumn("i", F.row_number().over(w).cast("bigint"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("bigint").alias("total_events"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("wsum"),
    ).select(
        "n_users",
        "total_events",
        (
            F.expr("CAST(2 * wsum AS DOUBLE) / (n_users * total_events)")
            - F.expr("CAST(n_users + 1 AS DOUBLE) / n_users")
        ).alias("gini"),
    )


_GINI_SQL = """
WITH per AS (SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id),
ranked AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, user_id) AS BIGINT) AS i
  FROM per
),
agg AS (
  SELECT COUNT(*) AS n_users, CAST(SUM(x) AS BIGINT) AS total_events,
         CAST(SUM(i * x) AS BIGINT) AS wsum
  FROM ranked
)
SELECT n_users, total_events,
       CAST(2 * wsum AS DOUBLE) / (n_users * total_events)
         - CAST(n_users + 1 AS DOUBLE) / n_users AS gini
FROM agg
"""

# ------------------------------------------------------------ key skew
# Shuffle-key skew audit: for each candidate partitioning key, hash rows
# onto a fixed 32-slot grid (md5-derived, engine-independent — this
# audits the KEY DISTRIBUTION, not any engine's internal hash) and
# report per-key imbalance: slots used, max/min slot load, the
# imbalance factor max·slots/total (1.0 = perfectly even), and the
# share of rows on the single hottest raw key. The diagnosis a pipeline
# runs before picking join/agg keys at scale — an imbalance factor of k
# means the slowest reducer does k× the average work.
#
# Scale: one aggregate per candidate key over derived (key, slot)
# columns; output is |candidates| rows.

_SKEW_SLOTS = 32


def q_ev_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")

    def audit(col: str) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        slots = (
            ev.select((h % _SKEW_SLOTS).alias("slot"))
            .groupBy("slot")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        keys = (
            ev.groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("kn"))
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.max("kn").alias("hottest_key_rows"),
            )
        )
        return (
            slots.agg(
                F.count(F.lit(1)).alias("slots_used"),
                F.sum("n").cast("bigint").alias("total_rows"),
                F.max("n").alias("max_slot"),
                F.min("n").alias("min_slot"),
            )
            .join(keys)
            .select(
                F.lit(col).alias("key_name"),
                "n_keys", "total_rows", "slots_used", "max_slot", "min_slot",
                "hottest_key_rows",
                (
                    (F.col("max_slot") * _SKEW_SLOTS).cast("double")
                    / F.col("total_rows")
                ).alias("imbalance"),
                (
                    F.col("hottest_key_rows").cast("double")
                    / F.col("total_rows")
                ).alias("hottest_share"),
            )
        )

    return audit("user_id").unionByName(audit("event_type"))


def _key_skew_sql() -> str:
    def one(col: str) -> str:
        h = f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        return f"""
SELECT '{col}' AS key_name,
       (SELECT COUNT(*) FROM (SELECT {col} FROM events GROUP BY {col}))
         AS n_keys,
       CAST(SUM(n) AS BIGINT) AS total_rows,
       COUNT(*) AS slots_used,
       MAX(n) AS max_slot, MIN(n) AS min_slot,
       (SELECT MAX(kn) FROM (SELECT COUNT(*) AS kn FROM events
                             GROUP BY {col})) AS hottest_key_rows,
       CAST(MAX(n) * {_SKEW_SLOTS} AS DOUBLE) / SUM(n) AS imbalance,
       CAST((SELECT MAX(kn) FROM (SELECT COUNT(*) AS kn FROM events
                                  GROUP BY {col})) AS DOUBLE) / SUM(n)
         AS hottest_share
FROM (SELECT {h} % {_SKEW_SLOTS} AS slot, COUNT(*) AS n
      FROM events GROUP BY 1)
"""

    return one("user_id") + " UNION ALL " + one("event_type")


# ------------------------------------------------------------- bot detect
# Automation / bot-traffic detection from inter-arrival timing: real user
# gaps are exponential-ish (CV² ≈ 1), schedulers are metronomic (CV² → 0)
# and scrapers are fast (small mean gap). Per user: exact integer moments
# of the second-floored gaps (s1 = Σg, s2 = Σg²), the squared coefficient
# of variation quantized to a 1e4 grid via INTEGER floor division
# (CV² = (n·s2 − s1²)/s1² — no doubles anywhere, so both engines agree
# bit-for-bit), the count of exact-minute gaps (cron signature), and two
# calibrated flags. Thresholds are data-calibrated demonstrations (the
# synthetic corpus has no true metronomes); the operator's contract is
# the exact feature columns.
#
# Scale: one lag window + one aggregate per user — the same two-shuffle
# shape as sessionize. The BIGINT moment arithmetic holds to ~1e6 events
# per user (n·s2·1e4 < 9.2e18 for second-scale gaps); beyond that switch
# s2 to DECIMAL(38,0) — noted, not needed at any test sf.

_BOT_MIN_GAPS = 20


def q_ev_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) over "
            "(partition by user_id order by ts, event_id)) div 1000000"
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    per = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").cast("bigint").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("s2"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.sum(
            F.when((F.col("gap_s") > 0) & (F.col("gap_s") % 60 == 0), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_mod60"),
    ).where(F.col("n_gaps") >= _BOT_MIN_GAPS)
    feat = per.select(
        "user_id", "n_gaps", "s1", "s2", "min_gap_s", "max_gap_s", "n_mod60",
        F.expr("s1 div n_gaps").alias("mean_gap_s"),
        F.expr("((n_gaps * s2 - s1 * s1) * 10000) div (s1 * s1)")
        .alias("cv2_q4"),
    )
    return feat.select(
        "*",
        (F.col("cv2_q4") < 6500).alias("is_regular"),
        (F.col("mean_gap_s") < 40000).alias("is_high_rate"),
        (
            (F.col("cv2_q4") < 6500).cast("int")
            + (F.col("mean_gap_s") < 40000).cast("int")
        ).alias("suspicion"),
    )


_BOT_SQL = f"""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts::TIMESTAMP)
          - LAG(epoch_us(ts::TIMESTAMP))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM events
),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS s1,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2,
         MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s,
         CAST(SUM(CASE WHEN gap_s > 0 AND gap_s % 60 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_mod60
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
),
feat AS (
  SELECT user_id, n_gaps, s1, s2, min_gap_s, max_gap_s, n_mod60,
         s1 // n_gaps AS mean_gap_s,
         ((n_gaps * s2 - s1 * s1) * 10000) // (s1 * s1) AS cv2_q4
  FROM per WHERE n_gaps >= {_BOT_MIN_GAPS}
)
SELECT user_id, n_gaps, s1, s2, min_gap_s, max_gap_s, n_mod60, mean_gap_s,
       cv2_q4,
       cv2_q4 < 6500 AS is_regular,
       mean_gap_s < 40000 AS is_high_rate,
       CAST(cv2_q4 < 6500 AS INT) + CAST(mean_gap_s < 40000 AS INT)
         AS suspicion
FROM feat
"""

# ------------------------------------------------------------------- LTV
# Cohort lifetime-value curves: users cohorted by the epoch-week of their
# first event; revenue accumulated per (cohort, weeks-since-first) cell
# and normalized per cohort user — the standard LTV panel behind payback
# forecasting. Revenue sums are decimal-exact (dsum) and the cumulative
# sum is a decimal window aggregate, so only the final per-user division
# is IEEE. Scale: one per-user aggregate, one co-partitioned user_id
# join, one (cohort, week) aggregate over a tiny cell table; the cumsum
# window runs per cohort over ≤ a few hundred offsets.


def q_ev_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    _WK = 7 * 24 * 3600 * 1_000_000
    ev = T(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr(f"min(unix_micros(ts)) div {_WK}").alias("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        ev.join(first, "user_id")
        .select(
            "cohort_week",
            (F.expr(f"unix_micros(ts) div {_WK}") - F.col("cohort_week"))
            .alias("week_offset"),
            "value",
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count_distinct("user_id").alias("active_users"),
            # keep the sum DECIMAL through the cumulative window: window
            # sums are segment-tree-ordered in DuckDB vs frame-ordered in
            # Spark, which diverges on doubles but never on decimals
            F.sum(dec("value", 2)).alias("rev_d"),
        )
    )
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week", "week_offset", "cohort_users", "active_users",
            F.col("rev_d").cast("double").alias("revenue"),
            F.sum("rev_d").over(wc).cast("double").alias("cum_revenue"),
            (
                F.sum("rev_d").over(wc).cast("double")
                / F.col("cohort_users")
            ).alias("ltv_per_user"),
        )
    )


_LTV_SQL = f"""
WITH first AS (
  SELECT user_id,
         MIN(epoch_us(ts::TIMESTAMP)) // {7 * 24 * 3600 * 1_000_000}
           AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_users FROM first GROUP BY 1
),
cells AS (
  SELECT f.cohort_week,
         epoch_us(e.ts::TIMESTAMP) // {7 * 24 * 3600 * 1_000_000}
           - f.cohort_week AS week_offset,
         COUNT(DISTINCT e.user_id) AS active_users,
         SUM(CAST(e.value AS DECIMAL(18,2))) AS rev_d
  FROM events e JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_offset, s.cohort_users, c.active_users,
       CAST(c.rev_d AS DOUBLE) AS revenue,
       CAST(SUM(c.rev_d) OVER (PARTITION BY c.cohort_week
                               ORDER BY c.week_offset
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue,
       CAST(SUM(c.rev_d) OVER (PARTITION BY c.cohort_week
                               ORDER BY c.week_offset
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / s.cohort_users AS ltv_per_user
FROM cells c JOIN sizes s USING (cohort_week)
"""


# ---------------------------------------------------------------- SCD2
# Slowly-Changing-Dimension Type-2 history build: compress each user's
# event-type sequence into versioned validity intervals
# [valid_from_us, valid_to_us) — the dimension-maintenance op every
# warehouse runs to turn a change stream into a point-in-time joinable
# history (Kimball SCD2). Change points via lag(); version numbers via a
# running sum of change flags; valid_to via lead() (NULL = current
# version). Output is the interval table for a deterministic 1-in-7 user
# slice (full table at sf0.1 would dominate the compare, not the logic).
#
# Scale shape: two windows over the same (user_id, time) partitioning —
# one shuffle total, no joins; the run-compression output is strictly
# smaller than the input. All integer micros arithmetic.

_SCD2_MOD = 7


def q_ev_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") % _SCD2_MOD == 0)
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("t_us")
    ).withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = (
        seq.withColumn(
            "version",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .groupBy("user_id", "version")
        .agg(
            # all rows in a run share one type; MIN == that type (and
            # matches the oracle's aggregate exactly)
            F.min("event_type").alias("state"),
            F.min("t_us").alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(wv).alias("valid_to_us"),
        "n_events",
        (F.lead("valid_from_us").over(wv) - F.col("valid_from_us"))
        .alias("dwell_us"),
    )


_SCD2_SQL = f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS t_us,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WHERE user_id % {_SCD2_MOD} = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
runs AS (
  SELECT user_id,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version,
         event_type, t_us
  FROM seq
),
grp AS (
  SELECT user_id, version, MIN(event_type) AS state,
         MIN(t_us) AS valid_from_us, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from_us,
       LEAD(valid_from_us) OVER wv AS valid_to_us, n_events,
       LEAD(valid_from_us) OVER wv - valid_from_us AS dwell_us
FROM grp
WINDOW wv AS (PARTITION BY user_id ORDER BY version)
"""


# ----------------------------------------------------------------- PSI
# Population-Stability-Index drift monitor: split the event timeline at
# its midpoint into a reference and a current window, bin three features
# (event type, hour-of-day, a fixed 50-unit value grid), and report per
# feature PSI = Σ (pᵢ−qᵢ)·log2(pᵢ/qᵢ) — the standard "did the input
# distribution move?" gate before retraining or backfilling. The log is
# the exact fixed-point _qlog2_expr (documents.py) over INTEGER args —
# log2(p/q) = qlog2((a+1)(B+K)) − qlog2((b+1)(A+K)) with add-one
# smoothing — and the per-bin contribution is kept integral:
#   num_bin = (a·B − b·A) · w_bin        (BIGINT, order-free sum)
#   psi     = Σ num / (16 · A · B)       (one double division at the end)
# so both engines agree bit-for-bit. (PSI in base 2; the conventional
# base-e figure is psi·ln2 — a presentation constant.)
#
# Scale shape: one narrow pass derives (feature, bin, side); one
# map-side-combined aggregate to ≤ 40 (feature, bin) cells; totals ride
# a partition-by-feature window over those cells. BIGINT bound:
# |a·B − b·A|·w ≤ n²·720 — safe through ~3e9 events per window; beyond
# that, lift num to DECIMAL(38,0) (the q_ev_bot_detect escalation rule).

_PSI_VSTEP = 50


def q_ev_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .documents import _qlog2_expr

    ev = T(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("t_us"), "event_type", "value"
    )
    span = ev.agg(
        F.expr("(min(t_us) + max(t_us)) div 2").alias("mid")
    )
    feats = (
        ev.join(F.broadcast(span))  # single-row broadcast NLJ
        .select(
            F.when(F.col("t_us") <= F.col("mid"), F.lit(1)).otherwise(0)
            .alias("is_ref"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("event_type").alias("feature"),
                        F.col("event_type").alias("bin"),
                    ),
                    F.struct(
                        F.lit("hour_of_day").alias("feature"),
                        F.expr("cast((t_us div 3600000000) % 24 as string)")
                        .alias("bin"),
                    ),
                    F.struct(
                        F.lit("value_bin").alias("feature"),
                        F.floor(F.col("value") / _PSI_VSTEP)
                        .cast("string").alias("bin"),
                    ),
                )
            ).alias("fb"),
        )
        .select("is_ref", "fb.feature", "fb.bin")
    )
    cells = feats.groupBy("feature", "bin").agg(
        F.sum("is_ref").cast("bigint").alias("a"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("b"),
    )
    wf = Window.partitionBy("feature")
    tot = cells.select(
        "feature",
        "bin",
        "a",
        "b",
        F.sum("a").over(wf).cast("bigint").alias("ta"),
        F.sum("b").over(wf).cast("bigint").alias("tb"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("k"),
    )
    num = f"""
      ((a * tb - b * ta) *
       ({_qlog2_expr('(a + 1) * (tb + k)', 'spark')}
        - {_qlog2_expr('(b + 1) * (ta + k)', 'spark')}))
    """
    return (
        tot.withColumn("num", F.expr(num).cast("bigint"))
        .groupBy("feature")
        .agg(
            F.max("k").alias("n_bins"),
            F.max("ta").alias("ref_rows"),
            F.max("tb").alias("cur_rows"),
            F.sum("num").cast("bigint").alias("psi_q"),
        )
        .select(
            "feature",
            "n_bins",
            "ref_rows",
            "cur_rows",
            "psi_q",
            (
                F.col("psi_q").cast("double")
                / (F.lit(16) * F.col("ref_rows") * F.col("cur_rows"))
                .cast("double")
            ).alias("psi"),
        )
    )


def _psi_sql() -> str:
    from .documents import _qlog2_expr

    num = (
        "((a * tb - b * ta) * "
        f"({_qlog2_expr('(a + 1) * (tb + k)', 'duckdb')}"
        f" - {_qlog2_expr('(b + 1) * (ta + k)', 'duckdb')}))"
    )
    return f"""
WITH ev AS (
  SELECT epoch_us(ts::TIMESTAMP) AS t_us, event_type, value FROM events
),
span AS (SELECT (MIN(t_us) + MAX(t_us)) // 2 AS mid FROM ev),
feats AS (
  SELECT CASE WHEN t_us <= mid THEN 1 ELSE 0 END AS is_ref,
         'event_type' AS feature, event_type AS bin FROM ev, span
  UNION ALL
  SELECT CASE WHEN t_us <= mid THEN 1 ELSE 0 END,
         'hour_of_day', CAST((t_us // 3600000000) % 24 AS VARCHAR)
  FROM ev, span
  UNION ALL
  SELECT CASE WHEN t_us <= mid THEN 1 ELSE 0 END,
         'value_bin', CAST(CAST(FLOOR(value / {_PSI_VSTEP}) AS BIGINT)
                           AS VARCHAR)
  FROM ev, span
),
cells AS (
  SELECT feature, bin, CAST(SUM(is_ref) AS BIGINT) AS a,
         CAST(SUM(1 - is_ref) AS BIGINT) AS b
  FROM feats GROUP BY 1, 2
),
tot AS (
  SELECT feature, bin, a, b,
         CAST(SUM(a) OVER wf AS BIGINT) AS ta,
         CAST(SUM(b) OVER wf AS BIGINT) AS tb,
         CAST(COUNT(*) OVER wf AS BIGINT) AS k
  FROM cells
  WINDOW wf AS (PARTITION BY feature)
)
SELECT feature, MAX(k) AS n_bins, MAX(ta) AS ref_rows, MAX(tb) AS cur_rows,
       CAST(SUM({num}) AS BIGINT) AS psi_q,
       CAST(SUM({num}) AS DOUBLE)
         / CAST(16 * MAX(ta) * MAX(tb) AS DOUBLE) AS psi
FROM tot GROUP BY feature
"""


# ------------------------------------------------------------ survival
# Kaplan–Meier time-to-conversion with right censoring: per user the
# duration (hours) from first event to first purchase — users who never
# convert are censored at their last event — then the product-limit
# estimator S(t) = Π_{u ≤ t} (n_u − d_u)/n_u over event times, where
# n_u = at-risk count (duration ≥ u) and d_u = conversions at u. The
# "how long until users convert, accounting for the ones still waiting"
# curve behind retention and TTFP dashboards. The cumulative product is
# evaluated in exact fixed point (scale 2^40): acc ← (acc·(n−d)) DIV n,
# folded in pinned time order — sequential integer folds are
# bit-identical in both engines (the ofold rule for products).
#
# Scale shape: one per-user aggregate; the curve lives on an
# hour-bucketed grid bounded by the observation horizon (≤ ~720 rows),
# so the reverse-cumulative risk window, the prefix self-join (t' ≤ t,
# annotated NLJ over the tiny grid), and the per-row fold all touch
# bounded data. BIGINT bound: acc·(n−d) ≤ 2^40·n_users — safe through
# ~8M at-risk users; beyond that lift the fold to DECIMAL(38,0).

_KM_SCALE = 1 << 40
_HOUR_US = 3_600_000_000


def q_ev_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    per = (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            (F.col("event_type") == "purchase").cast("int").alias("is_conv"),
        )
        .groupBy("user_id")
        .agg(
            F.min("t_us").alias("t0"),
            F.max("t_us").alias("t_last"),
            F.min(F.when(F.col("is_conv") == 1, F.col("t_us"))).alias("tc"),
        )
        .select(
            F.when(F.col("tc").isNotNull(), 1).otherwise(0).alias("event"),
            F.expr(
                f"(coalesce(tc, t_last) - t0) div {_HOUR_US}"
            ).alias("dur_h"),
        )
    )
    hours = per.groupBy("dur_h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("event").cast("bigint").alias("d"),
    )
    wrev = (
        Window.orderBy(F.desc("dur_h"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = hours.select(
        "dur_h",
        "d",
        F.sum("n_all").over(wrev).cast("bigint").alias("nr"),
    ).filter(F.col("d") > 0)
    # prefix self-join over the bounded grid; re-alias the probe side so
    # the self-join does not hit conflicting-attributes resolution
    probe = risk.select(
        F.col("dur_h").alias("tp"),
        F.col("nr").alias("p_nr"),
        F.col("d").alias("p_d"),
    )
    return (
        risk.join(F.broadcast(probe), F.col("tp") <= F.col("dur_h"))
        .groupBy("dur_h", "nr", "d")
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "  struct(tp, p_nr, p_d))), t -> struct(t.p_nr, t.p_d)),"
                f" CAST({_KM_SCALE} AS BIGINT),"
                " (acc, x) -> (acc * (x.p_nr - x.p_d)) div x.p_nr)"
            ).alias("surv_q")
        )
        .select(
            F.col("dur_h").alias("t_hours"),
            F.col("nr").alias("n_risk"),
            F.col("d").alias("d_events"),
            "surv_q",
            (F.col("surv_q").cast("double") / F.lit(float(_KM_SCALE)))
            .alias("survival"),
        )
    )


_SURVIVAL_SQL = f"""
WITH per AS (
  SELECT CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts::TIMESTAMP) END) IS NOT NULL
              THEN 1 ELSE 0 END AS event,
         (COALESCE(MIN(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts::TIMESTAMP) END),
                   MAX(epoch_us(ts::TIMESTAMP)))
          - MIN(epoch_us(ts::TIMESTAMP))) // {_HOUR_US} AS dur_h
  FROM events GROUP BY user_id
),
hours AS (
  SELECT dur_h, CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(event) AS BIGINT) AS d
  FROM per GROUP BY dur_h
),
risk AS (
  SELECT dur_h, d,
         CAST(SUM(n_all) OVER (ORDER BY dur_h DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nr
  FROM hours
),
km AS (
  -- list_reduce has no separate seed type: smuggle the accumulator in
  -- a struct of the element's shape and read .nr at the end
  SELECT a.dur_h AS t_hours, a.nr AS n_risk, a.d AS d_events,
         (list_reduce(
            list_prepend(
              struct_pack(nr := CAST({_KM_SCALE} AS BIGINT),
                          d := CAST(0 AS BIGINT)),
              list(struct_pack(nr := b.nr, d := b.d) ORDER BY b.dur_h)),
            (acc, x) -> struct_pack(
              nr := (acc.nr * (x.nr - x.d)) // x.nr,
              d := CAST(0 AS BIGINT)))).nr AS surv_q
  FROM (SELECT * FROM risk WHERE d > 0) a
  JOIN (SELECT * FROM risk WHERE d > 0) b ON b.dur_h <= a.dur_h
  GROUP BY a.dur_h, a.nr, a.d
)
SELECT t_hours, n_risk, d_events, surv_q,
       CAST(surv_q AS DOUBLE) / {float(_KM_SCALE)} AS survival
FROM km
"""


# ------------------------------------------------- Markov attribution
# Removal-effect channel attribution (Anderl et al. 2016, the standard
# data-driven alternative to last-touch): model each user journey as a
# first-order Markov chain over touchpoints (view/click/signup/error)
# with absorbing states conv (= purchase) and null (journey ends
# unconverted; journeys split AFTER each purchase), then score channel x
# by how much the start→conv absorption probability drops when x is
# removed (edges into x redirect to null). Absorption is evaluated as a
# fixed _MK_STEPS-step power iteration in EXACT fixed point: transition
# weights w(s,t) = (c_st · 2^20) DIV r_s, state vector updated as
# p'(t) = (Σ_s p(s)·w(s,t)) DIV 2^20 — integer sums are order-free, so
# Spark, the driver loop, and DuckDB agree bit-for-bit; the only double
# is the final removal_effect division.
#
# Scale shape: the corpus-sized work is two same-key window passes over
# (user, time) deriving journey edges, reduced to a ≤ 6×6 transition
# matrix. The 12-step × 5-scenario iteration runs on that bounded matrix
# driver-side (the q_emb_mmr bounded-pool rule: O(channels²·steps),
# independent of data scale); the oracle unrolls the same integer
# iteration as 12 CTE steps. Products stay ≤ 2^43 — BIGINT-safe always.

_MK_SCALE = 1 << 20
_MK_STEPS = 12
_MK_CHANNELS = ("click", "error", "signup", "view")


def q_ev_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("t_us")
    ).withColumn(
        "jump",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) == "purchase"),
            1,
        ).otherwise(0),
    )
    sj = seq.select(
        "user_id",
        "t_us",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("conv"))
        .otherwise(F.col("event_type"))
        .alias("state"),
        F.sum("jump").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("j"),
    )
    wj = Window.partitionBy("user_id", "j").orderBy("t_us", "event_id")
    lagged = sj.select(
        "state",
        F.coalesce(F.lag("state").over(wj), F.lit("start")).alias("from_state"),
        F.lead("state").over(wj).alias("nxt"),
    )
    edges = lagged.select(
        "from_state", F.col("state").alias("to_state")
    ).unionAll(
        lagged.filter(F.col("nxt").isNull() & (F.col("state") != "conv"))
        .select(F.col("state").alias("from_state"), F.lit("null").alias("to_state"))
    )
    counts = (
        edges.groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()  # bounded: ≤ (1 + |channels|) × (|channels| + 2) cells
    )
    assert len(counts) <= 64, "transition matrix unexpectedly large"

    r: dict[str, int] = {}
    for row in counts:
        r[row.from_state] = r.get(row.from_state, 0) + row.c
    base = {
        (row.from_state, row.to_state): (row.c * _MK_SCALE) // r[row.from_state]
        for row in counts
    }

    def absorb(removed: str | None) -> int:
        wm: dict[tuple[str, str], int] = {}
        for (f, t), v in base.items():
            if f == removed:
                continue  # the removed state is never entered
            t2 = "null" if t == removed else t
            wm[(f, t2)] = wm.get((f, t2), 0) + v
        wm[("conv", "conv")] = _MK_SCALE
        wm[("null", "null")] = _MK_SCALE
        p = {"start": _MK_SCALE}
        for _ in range(_MK_STEPS):
            nxt: dict[str, int] = {}
            for (f, t), v in wm.items():
                if f in p:
                    nxt[t] = nxt.get(t, 0) + p[f] * v
            p = {t: v // _MK_SCALE for t, v in nxt.items()}
        return p.get("conv", 0)

    p_full = absorb(None)
    rows = []
    for ch in _MK_CHANNELS:
        p_rm = absorb(ch)
        rows.append(
            (
                ch,
                p_full,
                p_rm,
                p_full - p_rm,
                float(p_full - p_rm) / float(p_full) if p_full else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_conv_full_q bigint, p_conv_removed_q bigint,"
        " removal_q bigint, removal_effect double",
    )


def _markov_sql() -> str:
    steps = []
    for k in range(1, _MK_STEPS + 1):
        steps.append(
            f"s{k} AS (\n"
            f"  SELECT w.sc, w.to_state AS state,\n"
            f"         CAST(SUM(p.p * w.w) // {_MK_SCALE} AS BIGINT) AS p\n"
            f"  FROM s{k - 1} p JOIN wmat w\n"
            f"    ON w.sc = p.sc AND w.from_state = p.state\n"
            f"  GROUP BY 1, 2\n"
            f")"
        )
    chans = ", ".join(f"('{c}')" for c in _MK_CHANNELS)
    return f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS t_us,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w = 'purchase'
              THEN 1 ELSE 0 END AS jump
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
sj AS (
  SELECT user_id, t_us, event_id,
         CASE WHEN event_type = 'purchase' THEN 'conv'
              ELSE event_type END AS state,
         SUM(jump) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                         ROWS UNBOUNDED PRECEDING) AS j
  FROM seq
),
lagged AS (
  SELECT state, COALESCE(LAG(state) OVER wj, 'start') AS from_state,
         LEAD(state) OVER wj AS nxt
  FROM sj WINDOW wj AS (PARTITION BY user_id, j ORDER BY t_us, event_id)
),
edges AS (
  SELECT from_state, state AS to_state FROM lagged
  UNION ALL
  SELECT state, 'null' FROM lagged WHERE nxt IS NULL AND state <> 'conv'
),
counts AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS c
  FROM edges GROUP BY 1, 2
),
outd AS (
  SELECT from_state, CAST(SUM(c) AS BIGINT) AS r FROM counts GROUP BY 1
),
basew AS (
  SELECT c.from_state, c.to_state, (c.c * {_MK_SCALE}) // o.r AS w
  FROM counts c JOIN outd o USING (from_state)
),
scen AS (
  SELECT sc FROM (VALUES ('full'), {chans}) s(sc)
),
wmat AS (
  SELECT sc, from_state,
         CASE WHEN to_state = sc THEN 'null' ELSE to_state END AS to_state,
         CAST(SUM(w) AS BIGINT) AS w
  FROM scen, basew
  WHERE from_state <> sc
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT sc, a.s, a.s, CAST({_MK_SCALE} AS BIGINT)
  FROM scen, (VALUES ('conv'), ('null')) a(s)
),
s0 AS (
  SELECT sc, 'start' AS state, CAST({_MK_SCALE} AS BIGINT) AS p FROM scen
),
{",".join(steps)}
SELECT c.sc AS channel,
       f.p AS p_conv_full_q,
       COALESCE(r.p, 0) AS p_conv_removed_q,
       f.p - COALESCE(r.p, 0) AS removal_q,
       CASE WHEN f.p = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(f.p - COALESCE(r.p, 0) AS DOUBLE) / CAST(f.p AS DOUBLE)
       END AS removal_effect
FROM (SELECT sc FROM scen WHERE sc <> 'full') c
JOIN (SELECT p FROM s{_MK_STEPS} WHERE sc = 'full' AND state = 'conv') f ON 1 = 1
LEFT JOIN (SELECT sc, p FROM s{_MK_STEPS} WHERE state = 'conv') r
  ON r.sc = c.sc
"""


# ------------------------------------------------------------ MAD outliers
# Robust per-type outlier detection by median / median-absolute-deviation
# (the standard robust z-score, immune to the outliers it hunts — unlike
# mean/stddev which the anomalies themselves poison). Medians are LOWER
# medians picked positionally (row_number at (n+1) div 2 with ties pinned
# by event_id), so both engines select the SAME physical value and no
# float interpolation ever happens; |v − med| and the 3·MAD comparison are
# pure IEEE ops on identical inputs. Scale shape: two row_number windows
# partitioned by event_type (the natural key), one broadcast join of the
# ≤|types| median table back — no global sort, no collect.

_MAD_K = 3  # flag |v - med| > K * MAD


def q_ev_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("event_id", "event_type", "value")
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        ev.withColumn("rn", F.row_number().over(w1))
        .join(F.broadcast(n), "event_type")
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    # dev feeds both the MAD median branch and the final aggregate —
    # persist it, or the full-events row_number window runs twice
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    ).transform(_tp)
    w2 = Window.partitionBy("event_type").orderBy("d", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w2))
        .join(F.broadcast(n), "event_type")
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("d") > _MAD_K * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type", "n_events", "med", "mad", "n_outliers",
            (F.col("n_outliers").cast("double") / F.col("n_events"))
            .alias("outlier_rate"),
        )
    )


_MAD_SQL = f"""
WITH ev AS (SELECT event_id, event_type, value FROM events),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
r1 AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM ev
),
med AS (
  SELECT r1.event_type, r1.value AS med
  FROM r1 JOIN n USING (event_type) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT ev.event_type, abs(ev.value - med.med) AS d, ev.event_id, med.med
  FROM ev JOIN med USING (event_type)
),
r2 AS (
  SELECT event_type, d,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY d, event_id) AS rn
  FROM dev
),
mad AS (
  SELECT r2.event_type, r2.d AS mad
  FROM r2 JOIN n USING (event_type) WHERE rn = (n + 1) // 2
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(dev.med) AS med,
       MIN(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dev.d > {_MAD_K} * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN dev.d > {_MAD_K} * mad.mad THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS outlier_rate
FROM dev JOIN mad USING (event_type)
GROUP BY 1
"""


# ------------------------------------------------------------- stickiness
# DAU / WAU(7) engagement stickiness per calendar day — the product
# metric every event pipeline reports. The trailing-7-day distinct-user
# count is computed WITHOUT per-day distinct scans: each distinct
# (user, day) pair supports the 7 days [d, d+6], so one bounded ×7
# explode of the user-day table followed by a pair-dedup groupBy yields
# every window count in a single pass. Day grid is gap-filled (a day with
# no events still has a WAU from its trailing week). Scale shape: the
# user-day table is ≪ events; everything after is bounded by |users|·days.


def q_ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    ud = (
        ev.select(
            F.expr("unix_micros(ts) div 86400000000").alias("d"), "user_id"
        )
        .distinct()
        .transform(_tp)
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    bounds = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    wau = (
        ud.select(
            F.explode(F.expr("sequence(d, d + 6)")).alias("sd"), "user_id"
        )
        .distinct()
        .groupBy("sd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau7"))
    )
    grid = bounds.select(F.explode(F.expr("sequence(d0, d1)")).alias("sd"))
    return (
        grid.join(wau, "sd", "left")
        .join(dau.withColumnRenamed("d", "sd"), "sd", "left")
        .select(
            F.timestamp_micros(F.expr("sd * 86400000000")).alias("day"),
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            F.coalesce("wau7", F.lit(0)).cast("bigint").alias("wau7"),
            # wau7 = 0 (a fully idle trailing week) must yield 0.0, not
            # engine-divergent 0/0 (Spark NaN vs DuckDB NULL)
            F.when(
                F.coalesce("wau7", F.lit(0)) == 0, F.lit(0.0)
            ).otherwise(
                F.coalesce("dau", F.lit(0)).cast("double")
                / F.col("wau7").cast("double")
            ).alias("stickiness"),
        )
    )


_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT epoch_us(ts::TIMESTAMP) // 86400000000 AS d, user_id
  FROM events
),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
sup AS (
  SELECT DISTINCT d + t.i AS sd, user_id
  FROM ud, unnest(range(0, 7)) t(i)
),
wau AS (SELECT sd, CAST(COUNT(*) AS BIGINT) AS wau7 FROM sup GROUP BY 1),
grid AS (SELECT t.i AS sd FROM bounds, unnest(range(d0, d1 + 1)) t(i))
SELECT make_timestamp(sd * 86400000000) AS day,
       COALESCE(dau.dau, 0) AS dau,
       COALESCE(wau.wau7, 0) AS wau7,
       CASE WHEN COALESCE(wau.wau7, 0) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(COALESCE(dau.dau, 0) AS DOUBLE)
                   / CAST(wau.wau7 AS DOUBLE)
       END AS stickiness
FROM grid LEFT JOIN wau USING (sd) LEFT JOIN dau ON dau.d = grid.sd
"""


# ----------------------------------------------------------------- ACF
# Exact autocorrelation of the gap-filled hourly event-count series at
# lags 1 and 24 — the seasonality detector behind the choice of the
# q_ev_forecast seasonal-naive lag. Exactness: with integer counts c_t,
# total S and n hours, n²·(c_t − c̄)(c_{t+k} − c̄) = (n·c_t − S)(n·c_{t+k} − S)
# is INTEGER; numerator and denominator are summed as DECIMAL(38,0)
# (mergeable, order-invariant, and the headroom for cluster-scale counts
# where BIGINT products would overflow) and divided once at the edge.
# Scale shape: one hourly aggregate, a self-join on h+k over the bounded
# hour grid, constant-size lag lattice.

_ACF_LAGS = (1, 24)


def q_ev_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    hours = ev.select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
    counts = hours.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bounds = hours.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    filled = (
        grid.join(counts, "h", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
        .transform(_tp)
    )
    tot = filled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    den = (
        filled.join(F.broadcast(tot))
        .agg(
            F.sum(F.expr("CAST((n * c - s) AS DECIMAL(38,0)) * (n * c - s)"))
            .alias("den_d"),
            F.min("n").alias("n"),
        )
    )
    lags = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(k) for k in _ACF_LAGS])).alias("lag")
    )
    pairs = (
        filled.join(F.broadcast(lags))
        .select("lag", (F.col("h") + F.col("lag")).alias("h2"), F.col("c").alias("x"))
        .join(
            filled.select(F.col("h").alias("h2"), F.col("c").alias("y")), "h2"
        )
        .join(F.broadcast(tot))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.expr("CAST((n * x - s) AS DECIMAL(38,0)) * (n * y - s)"))
            .alias("num_d"),
        )
    )
    return (
        pairs.join(F.broadcast(den))
        .select(
            "lag",
            F.col("n").alias("n_hours"),
            "n_pairs",
            (F.col("num_d").cast("double") / F.col("den_d").cast("double"))
            .alias("acf"),
        )
        .orderBy("lag")
    )


def _acf_sql() -> str:
    lag_vals = ", ".join(f"({k})" for k in _ACF_LAGS)
    # wide-decimal -> double must route through VARCHAR in DuckDB (the
    # direct cast is not correctly rounded; see _util docstring)
    num_dbl = "CAST(CAST(num_d AS VARCHAR) AS DOUBLE)"
    den_dbl = "CAST(CAST(den_d AS VARCHAR) AS DOUBLE)"
    return f"""
WITH hours AS (
  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h FROM events
),
counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hours GROUP BY 1),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hours),
filled AS (
  SELECT t.i AS h, COALESCE(c, CAST(0 AS BIGINT)) AS c
  FROM bounds, unnest(range(h0, h1 + 1)) t(i)
  LEFT JOIN counts ON counts.h = t.i
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM filled
),
den AS (
  -- BIGINT products (overflow-checked), summed into HUGEINT: exact, and
  -- the engine twin of Spark's DECIMAL(38,0) accumulation
  SELECT SUM((n * c - s) * (n * c - s)) AS den_d,
         MIN(n) AS n
  FROM filled, tot
),
lags AS (SELECT lag FROM (VALUES {lag_vals}) l(lag)),
pairs AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM((n * a.c - s) * (n * b.c - s)) AS num_d
  FROM lags, filled a, filled b, tot
  WHERE b.h = a.h + lag
  GROUP BY lag
)
SELECT lag, den.n AS n_hours, n_pairs,
       {num_dbl} / {den_dbl} AS acf
FROM pairs, den
ORDER BY lag
"""


# ----------------------------------------------------------- SLO burn rate
# Multiwindow burn-rate alerting (the Google SRE workbook pattern) over
# the event stream's error rate against a 99% SLO: per hour, the 1 h and
# trailing 6 h error fractions are turned into burn rates
# (rate / error-budget) and the alert fires when BOTH windows exceed
# their thresholds (14.4× short / 6× long — the standard fast-burn page).
# Exactness: thresholds are applied by integer cross-multiplication
# (1000·errors > 144·total ⟺ burn > 14.4 with budget 1%), so the flag
# never touches a float; the reported burn-rate columns are one double
# division each. Scale shape: one hourly aggregate + one 6-row trailing
# window over the bounded hour grid.

_SLO_BUDGET_MILLI = 10  # 99% SLO → 1% budget
_SLO_SHORT_X10 = 144  # 14.4× short-window burn
_SLO_LONG_X10 = 60  # 6× long-window burn


def q_ev_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    observed = (
        ev.select(
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("e"),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("t1"),
            F.sum("e").cast("bigint").alias("e1"),
        )
        .transform(_tp)
    )
    # gap-fill: a quiet hour has zero traffic but still occupies a slot
    # of the trailing window (ROWS 6 ≡ real 6 h only on a dense grid)
    bounds = observed.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hourly = (
        bounds.select(F.explode(F.expr("sequence(h0, h1)")).alias("h"))
        .join(observed, "h", "left")
        .select(
            "h",
            F.coalesce("t1", F.lit(0)).cast("bigint").alias("t1"),
            F.coalesce("e1", F.lit(0)).cast("bigint").alias("e1"),
        )
    )
    w6 = Window.orderBy("h").rowsBetween(-5, 0)
    rolled = hourly.select(
        "h",
        "t1",
        "e1",
        F.sum("t1").over(w6).cast("bigint").alias("t6"),
        F.sum("e1").over(w6).cast("bigint").alias("e6"),
    )
    # burn = (e/t) / budget; threshold by integer cross-multiplication:
    # e/t > X/10 * budget_milli/1000  ⟺  10000·e > X·budget_milli·t
    short_hot = (
        F.lit(10000) * F.col("e1")
        > F.lit(_SLO_SHORT_X10 * _SLO_BUDGET_MILLI) * F.col("t1")
    )
    long_hot = (
        F.lit(10000) * F.col("e6")
        > F.lit(_SLO_LONG_X10 * _SLO_BUDGET_MILLI) * F.col("t6")
    )
    return rolled.select(
        F.timestamp_micros(F.expr("h * 3600000000")).alias("ts_hour"),
        "t1",
        "e1",
        "t6",
        "e6",
        # zero-traffic guard: 0/0 is NaN-vs-NULL engine-divergent (and
        # an ANSI error in the driver session) — an empty window burns 0
        F.when(F.col("t1") == 0, F.lit(0.0)).otherwise(
            F.col("e1").cast("double")
            / F.col("t1").cast("double")
            * F.lit(1000.0 / _SLO_BUDGET_MILLI)
        ).alias("burn_1h"),
        F.when(F.col("t6") == 0, F.lit(0.0)).otherwise(
            F.col("e6").cast("double")
            / F.col("t6").cast("double")
            * F.lit(1000.0 / _SLO_BUDGET_MILLI)
        ).alias("burn_6h"),
        F.when(short_hot & long_hot, 1).otherwise(0).alias("page"),
    )


_SLO_SQL = f"""
WITH observed AS (
  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS e1
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM observed),
hourly AS (
  SELECT t.i AS h, COALESCE(t1, CAST(0 AS BIGINT)) AS t1,
         COALESCE(e1, CAST(0 AS BIGINT)) AS e1
  FROM bounds, unnest(range(h0, h1 + 1)) t(i)
  LEFT JOIN observed ON observed.h = t.i
),
rolled AS (
  SELECT h, t1, e1,
         CAST(SUM(t1) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS t6,
         CAST(SUM(e1) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS e6
  FROM hourly
)
SELECT make_timestamp(h * 3600000000) AS ts_hour, t1, e1, t6, e6,
       CASE WHEN t1 = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(e1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                   * {1000.0 / _SLO_BUDGET_MILLI} END AS burn_1h,
       CASE WHEN t6 = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(e6 AS DOUBLE) / CAST(t6 AS DOUBLE)
                   * {1000.0 / _SLO_BUDGET_MILLI} END AS burn_6h,
       CASE WHEN 10000 * e1 > {_SLO_SHORT_X10 * _SLO_BUDGET_MILLI} * t1
                 AND 10000 * e6 > {_SLO_LONG_X10 * _SLO_BUDGET_MILLI} * t6
            THEN 1 ELSE 0 END AS page
FROM rolled
"""


# --------------------------------------------------------- seasonal profile
# Hour-of-day seasonality profile — the multiplicative seasonal index
# behind q_ev_forecast's seasonal-naive lag and q_ev_acf's lag-24 peak:
# index(hod) = (events in that hour-of-day / hours observed) / global
# hourly mean, computed as ONE double division of exact integer products
# c_hod·n / (n_hod·S). The gap-filled grid counts empty hours in n_hod,
# so quiet hours-of-day read below 1 honestly. Scale shape: one hourly
# aggregate reduced to a 24-row profile.


def q_ev_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    hours = ev.select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
    counts = hours.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).transform(_tp)
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    filled = (
        bounds.select(F.explode(F.expr("sequence(h0, h1)")).alias("h"))
        .join(counts, "h", "left")
        .select(
            F.expr("h % 24").alias("hod"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )
    tot = filled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    return (
        filled.groupBy("hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("c").cast("bigint").alias("n_events"),
        )
        .join(F.broadcast(tot))
        .select(
            "hod",
            "n_hours",
            "n_events",
            (
                (F.col("n_events") * F.col("n")).cast("double")
                / (F.col("n_hours") * F.col("s")).cast("double")
            ).alias("seasonal_index"),
        )
    )


_SEASONALITY_SQL = """
WITH hours AS (
  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h FROM events
),
counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hours GROUP BY 1),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts),
filled AS (
  SELECT t.i % 24 AS hod, COALESCE(c, CAST(0 AS BIGINT)) AS c
  FROM bounds, unnest(range(h0, h1 + 1)) t(i)
  LEFT JOIN counts ON counts.h = t.i
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM filled
)
SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(c) * n AS DOUBLE) / CAST(COUNT(*) * s AS DOUBLE)
         AS seasonal_index
FROM filled, tot
GROUP BY hod, n, s
"""


# ------------------------------------------------------------ burst detection
# Kleinberg-style burst detection (Kleinberg, KDD 2002 — the two-state
# automaton variant over the gap-filled hourly count series): state 0
# emits at the base rate λ = S/n, state 1 at 2λ; per-hour emission costs
# are the Poisson negative log-likelihood in EXACT fixed point
# (16·λ − c·16·log2 λ via _qlog2_expr's integer grid, the shared-c! term
# dropped), entering a burst costs γ = 512 (32 bits·16); the optimal
# state sequence is a 2-state Viterbi DP. Like q_ev_markov_attribution
# and q_emb_pca_power, the corpus-sized work is ONE distributed hourly
# aggregate; the DP runs driver-side over the bounded ≤n-hour series and
# the result is a literal burst-interval table. The DuckDB oracle runs
# the SAME integer DP as a forward recursive CTE plus a backward
# backtrace recursive CTE — full hash-match, ties broken toward state 0
# in both engines. 100 TB shape: the hour grid stays bounded no matter
# the event volume.

_BURST_GAMMA = 512  # 16·32: entering a burst must buy 32 fixed-point bits


def q_ev_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    ev = T(spark, sf_dir, "events")
    hours = ev.select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
    counts = hours.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).transform(_tp)
    # bounds from the tiny hourly aggregate — not a second events scan
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    filled = (
        bounds.select(F.explode(F.expr("sequence(h0, h1)")).alias("h"))
        .join(counts, "h", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
    )
    rows = sorted((r["h"], r["c"]) for r in filled.collect())
    cs = [c for _, c in rows]
    h0 = rows[0][0]
    n, s_tot = len(cs), sum(cs)

    def qlog2(x: int) -> int:
        e = x.bit_length() - 1
        return 16 * e + (16 * x) // (1 << e) - 16

    q_s, q_2s, q_n = qlog2(s_tot), qlog2(2 * s_tot), qlog2(n)

    def cost(state: int, c: int) -> int:
        if state == 0:
            return (16 * s_tot) // n - c * (q_s - q_n)
        return (16 * 2 * s_tot) // n - c * (q_2s - q_n)

    d = [(cost(0, cs[0]), cost(1, cs[0]) + _BURST_GAMMA)]
    for t in range(1, n):
        d0, d1 = d[-1]
        d.append(
            (
                cost(0, cs[t]) + min(d0, d1),
                cost(1, cs[t]) + min(d0 + _BURST_GAMMA, d1),
            )
        )
    states = [0] * n
    states[n - 1] = 0 if d[n - 1][0] <= d[n - 1][1] else 1
    for t in range(n - 2, -1, -1):
        if states[t + 1] == 1:
            states[t] = 0 if d[t][0] + _BURST_GAMMA <= d[t][1] else 1
        else:
            states[t] = 0 if d[t][0] <= d[t][1] else 1
    bursts, i, bid = [], 0, 0
    while i < n:
        if states[i] == 1:
            j = i
            while j < n and states[j] == 1:
                j += 1
            bid += 1
            bursts.append(
                (
                    bid,
                    (h0 + i) * 3_600_000_000,
                    (h0 + j - 1) * 3_600_000_000,
                    j - i,
                    sum(cs[i:j]),
                    max(cs[i:j]),
                )
            )
            i = j
        else:
            i += 1
    import datetime as dt

    schema = StructType(
        [
            StructField("burst_id", LongType(), False),
            StructField("start_hour", TimestampType(), False),
            StructField("end_hour", TimestampType(), False),
            StructField("n_hours", LongType(), False),
            StructField("total_events", LongType(), False),
            StructField("peak_hourly", LongType(), False),
        ]
    )
    rows_out = [
        (
            b,
            dt.datetime.fromtimestamp(su // 1_000_000, dt.timezone.utc)
            .replace(tzinfo=None),
            dt.datetime.fromtimestamp(eu // 1_000_000, dt.timezone.utc)
            .replace(tzinfo=None),
            nh,
            te,
            pk,
        )
        for b, su, eu, nh, te, pk in bursts
    ]
    return spark.createDataFrame(rows_out, schema)


def _bursts_sql() -> str:
    from .documents import _qlog2_expr

    q_s = _qlog2_expr("s_tot", "duckdb")
    q_2s = _qlog2_expr("(2 * s_tot)", "duckdb")
    q_n = _qlog2_expr("n", "duckdb")
    g = _BURST_GAMMA
    return f"""
WITH RECURSIVE hours AS (
  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h FROM events
),
counts AS MATERIALIZED (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hours GROUP BY 1),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hours),
filled AS MATERIALIZED (
  SELECT t.i - h0 AS t, COALESCE(c, CAST(0 AS BIGINT)) AS c
  FROM bounds, unnest(range(h0, h1 + 1)) t(i)
  LEFT JOIN counts ON counts.h = t.i
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s_tot
  FROM filled
),
-- MATERIALIZED is load-bearing on costs and fwd_m: each recursive
-- iteration re-evaluates INLINED upstream CTEs (a 720-step recursion
-- over an inlined event scan ran minutes; materialized, <1 s)
costs AS MATERIALIZED (
  SELECT t, c,
         (16 * s_tot) // n - c * ({q_s} - {q_n}) AS c0,
         (16 * 2 * s_tot) // n - c * ({q_2s} - {q_n}) AS c1
  FROM filled, tot
),
fwd AS (
  SELECT t, c0 AS d0, c1 + {g} AS d1 FROM costs WHERE t = 0
  UNION ALL
  SELECT costs.t,
         costs.c0 + LEAST(fwd.d0, fwd.d1),
         costs.c1 + LEAST(fwd.d0 + {g}, fwd.d1)
  FROM fwd JOIN costs ON costs.t = fwd.t + 1
),
fwd_m AS MATERIALIZED (SELECT * FROM fwd),
bwd AS (
  SELECT t, CASE WHEN d0 <= d1 THEN 0 ELSE 1 END AS state
  FROM fwd_m, tot WHERE t = n - 1
  UNION ALL
  SELECT fwd_m.t,
         CASE WHEN bwd.state = 1
              THEN CASE WHEN fwd_m.d0 + {g} <= fwd_m.d1 THEN 0 ELSE 1 END
              ELSE CASE WHEN fwd_m.d0 <= fwd_m.d1 THEN 0 ELSE 1 END
         END
  FROM bwd JOIN fwd_m ON fwd_m.t = bwd.t - 1
),
flagged AS (
  SELECT bwd.t, filled.c, state,
         CASE WHEN state = 1 AND COALESCE(LAG(state) OVER (ORDER BY bwd.t),
                                          0) = 0
              THEN 1 ELSE 0 END AS burst_start
  FROM bwd JOIN filled ON filled.t = bwd.t
),
grp AS (
  SELECT t, c, state,
         SUM(burst_start) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
           AS burst_id
  FROM flagged
)
SELECT CAST(burst_id AS BIGINT) AS burst_id,
       make_timestamp((MIN(t) + h0) * 3600000000) AS start_hour,
       make_timestamp((MAX(t) + h0) * 3600000000) AS end_hour,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(c) AS BIGINT) AS total_events,
       CAST(MAX(c) AS BIGINT) AS peak_hourly
FROM grp, bounds
WHERE state = 1
GROUP BY burst_id, h0
"""


# ----------------------------------------------------------- GDPR erasure
# Right-to-be-forgotten compliance audit: a deterministic ~25% erasure
# cohort (user hash % 4 == 0 — large enough that even the 15-user
# smallest-sf table has members — standing in for the request queue) is
# materialized as a distinct-user cohort frame and anti-joined out of
# the event log; the report carries what an auditor checks: rows
# before/after per event type, rows erased (semi-join), the bit_xor
# checksum of SURVIVING event ids (the tombstone-ledger fingerprint),
# and the residual count of surviving rows still in the cohort —
# computed by a second semi-join over the anti-join's OUTPUT, so a
# broken erasure path reports compliant = 0 instead of being true by
# construction. Scale shape: the cohort frame broadcasts (requests are
# ≪ corpus); one anti-join + two semi-joins on the natural key; nothing
# driver-side.

_GDPR_MOD = 4


def q_ev_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    ).transform(_tp)  # feeds before-counts, erasure, survivors, residual
    # the cohort as a distinct-user FRAME (the request-queue table), so
    # erasure and the residual check run through real join machinery
    # rather than re-evaluating a predicate inline
    cohort = (
        ev.select("user_id")
        .distinct()
        .filter(
            F.expr(
                "CAST(conv(substr(md5(concat('gdpr:', CAST(user_id AS"
                f" STRING))), 1, 15), 16, 10) AS BIGINT) % {_GDPR_MOD} = 0"
            )
        )
    )
    before = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    erased = (
        ev.join(F.broadcast(cohort), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_erased"))
    )
    survivors = ev.join(
        F.broadcast(cohort), "user_id", "left_anti"
    ).transform(_tp)
    after = survivors.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.bit_xor("event_id").cast("bigint").alias("survivor_xor"),
    )
    # residual: an INDEPENDENT semi-join of the surviving rows back
    # against the cohort — 0 only if the anti-join actually erased
    residual = (
        survivors.join(F.broadcast(cohort), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_residual"))
    )
    return (
        before.join(erased, "event_type", "left")
        .join(after, "event_type")
        .join(residual, "event_type", "left")
        .select(
            "event_type",
            "n_before",
            F.coalesce("n_erased", F.lit(0)).cast("bigint").alias("n_erased"),
            "n_after",
            "survivor_xor",
            F.coalesce("n_residual", F.lit(0)).cast("bigint")
            .alias("n_residual"),
            F.when(
                (F.coalesce("n_residual", F.lit(0)) == 0)
                & (
                    F.col("n_before")
                    == F.coalesce("n_erased", F.lit(0)) + F.col("n_after")
                ),
                1,
            ).otherwise(0).alias("compliant"),
        )
    )


_GDPR_SQL = f"""
WITH cohort AS (
  SELECT DISTINCT user_id FROM events
  WHERE CAST(('0x' || substr(md5('gdpr:' || CAST(user_id AS VARCHAR)),
              1, 15)) AS BIGINT) % {_GDPR_MOD} = 0
),
before AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_before
  FROM events GROUP BY 1
),
erased AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_erased
  FROM events e WHERE EXISTS (SELECT 1 FROM cohort c
                              WHERE c.user_id = e.user_id)
  GROUP BY 1
),
survivors AS (
  SELECT event_id, event_type, user_id FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM cohort c WHERE c.user_id = e.user_id)
),
after AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_after,
         CAST(bit_xor(event_id) AS BIGINT) AS survivor_xor
  FROM survivors GROUP BY 1
),
residual AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_residual
  FROM survivors s WHERE EXISTS (SELECT 1 FROM cohort c
                                 WHERE c.user_id = s.user_id)
  GROUP BY 1
)
SELECT b.event_type, b.n_before,
       COALESCE(e.n_erased, 0) AS n_erased,
       a.n_after, a.survivor_xor,
       COALESCE(r.n_residual, 0) AS n_residual,
       CASE WHEN COALESCE(r.n_residual, 0) = 0
                 AND b.n_before = COALESCE(e.n_erased, 0) + a.n_after
            THEN 1 ELSE 0 END AS compliant
FROM before b
LEFT JOIN erased e USING (event_type)
JOIN after a USING (event_type)
LEFT JOIN residual r USING (event_type)
"""


# -------------------------------------------------------- watermark planning
# Watermark-delay planning audit: the driver data arrives in perfect
# event-time order (event_id ≡ ts order), so delivery disorder is
# simulated with a deterministic hash jitter — arrival_us = ts_us +
# h(event_id) mod 120 s, a bounded network-delay model. Replaying events
# in ARRIVAL order, an event is late-by the running max event time minus
# its own; for each candidate watermark delay the audit reports how many
# events a `withWatermark(delay)` would drop and the residual late rate —
# exactly the table an engineer reads before picking the q_stream_* delay.
# Integer µs end-to-end. Scale shape: one global arrival-order running-max
# window (the audit's cost — production would sample), then a single
# aggregate unpivoted over the constant delay lattice.

_WM_JITTER_US = 120_000_000
_WM_DELAYS_S = (0, 10, 30, 60, 120)


def q_ev_watermark_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "event_id", F.expr("unix_micros(ts)").alias("t_us")
    )
    arr = ev.select(
        "event_id",
        "t_us",
        (
            F.col("t_us")
            + F.expr(
                "CAST(conv(substr(md5(concat('wm:', CAST(event_id AS"
                " STRING))), 1, 15), 16, 10) AS BIGINT)"
            )
            % _WM_JITTER_US
        ).alias("a_us"),
    )
    w = Window.orderBy("a_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    late = arr.select(
        (F.max("t_us").over(w) - F.col("t_us")).alias("late_us")
    )
    aggs = late.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        *[
            F.sum(F.when(F.col("late_us") > d * 1_000_000, 1).otherwise(0))
            .cast("bigint")
            .alias(f"d{d}")
            for d in _WM_DELAYS_S
        ],
        F.max("late_us").cast("bigint").alias("max_late_us"),
    )
    stack = ", ".join(f"{d}L, d{d}" for d in _WM_DELAYS_S)
    return aggs.select(
        F.expr(
            f"stack({len(_WM_DELAYS_S)}, {stack}) AS (delay_s, n_dropped)"
        ),
        "n_events",
        "max_late_us",
    ).select(
        "delay_s",
        "n_events",
        "n_dropped",
        (F.col("n_dropped").cast("double") / F.col("n_events").cast("double"))
        .alias("drop_rate"),
        "max_late_us",
    )


def _watermark_plan_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS delay_s, d{d} AS n_dropped,"
        f" n_events, max_late_us FROM aggs"
        for d in _WM_DELAYS_S
    )
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN late_us > {d * 1_000_000} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS d{d}"
        for d in _WM_DELAYS_S
    )
    return f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts::TIMESTAMP) AS t_us FROM events
),
arr AS (
  SELECT event_id, t_us,
         t_us + CAST(('0x' || substr(md5('wm:' || CAST(event_id AS VARCHAR)),
                      1, 15)) AS BIGINT) % {_WM_JITTER_US} AS a_us
  FROM ev
),
late AS (
  SELECT MAX(t_us) OVER (ORDER BY a_us, event_id
                         ROWS UNBOUNDED PRECEDING) - t_us AS late_us
  FROM arr
),
aggs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events, {sums},
         CAST(MAX(late_us) AS BIGINT) AS max_late_us
  FROM late
)
SELECT delay_s, n_events, n_dropped,
       CAST(n_dropped AS DOUBLE) / CAST(n_events AS DOUBLE) AS drop_rate,
       max_late_us
FROM ({rows})
"""


# ------------------------------------------------------------- A/B z-test
# Experiment-analysis primitive: users hash-split 50/50 into variants
# (the same deterministic md5 assignment q_doc_split uses for train/test),
# per-user conversion = "power purchaser" (>= _AB_CONV_MIN purchase
# events — every synthetic user buys at least once, so "ever purchased"
# would saturate at 100% and make the pooled variance zero), and the
# two-proportion pooled z-statistic computed in closed form. Integer counts end-to-end; the
# z-score is a handful of IEEE ops (sqrt is correctly rounded in both
# engines) on exact integer inputs, so it hash-matches. The significance
# flag compares |z| against 1.959964 (the two-sided 5% critical value,
# injected as the same literal both sides). Scale shape: one user-grain
# aggregate, then a 2-row reduction.

_AB_ZCRIT = 1.959964
_AB_CONV_MIN = 14  # median user has 13 purchases at every sf


def q_ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= _AB_CONV_MIN,
                1,
            ).otherwise(0).alias("conv")
        )
        .select(
            F.expr(
                "CAST(conv(substr(md5(concat('ab:', CAST(user_id AS STRING))),"
                " 1, 15), 16, 10) AS BIGINT) % 2"
            ).alias("variant"),
            "conv",
        )
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    a = arms.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("k").alias("conv_a")
    )
    b = arms.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("k").alias("conv_b")
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    # degenerate-arm guard: pooled variance 0 (all or none convert)
    # must yield z = 0, not an ANSI divide-by-zero
    var = pp * (F.lit(1).cast("double") - pp) * (
        F.lit(1).cast("double") / F.col("n_a").cast("double")
        + F.lit(1).cast("double") / F.col("n_b").cast("double")
    )
    z = F.when(var > 0, (ra - rb) / F.sqrt(var)).otherwise(F.lit(0.0))
    return a.join(F.broadcast(b)).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (ra - rb).alias("abs_lift"),
        z.alias("z_score"),
        F.when(F.abs(z) > _AB_ZCRIT, 1).otherwise(0).alias("significant"),
    )


_AB_SQL = f"""
WITH users AS (
  SELECT CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= {_AB_CONV_MIN} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS k
  FROM users GROUP BY 1
),
ab AS (
  SELECT a.n AS n_a, a.k AS conv_a, b.n AS n_b, b.k AS conv_b
  FROM (SELECT n, k FROM arms WHERE variant = 0) a,
       (SELECT n, k FROM arms WHERE variant = 1) b
),
withvar AS (
  SELECT *,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
         (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           * (CAST(1 AS DOUBLE)
              - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
              + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE)) AS var_
  FROM ab
)
SELECT n_a, conv_a, n_b, conv_b, rate_a, rate_b,
       rate_a - rate_b AS abs_lift,
       CASE WHEN var_ > 0 THEN (rate_a - rate_b) / sqrt(var_)
            ELSE CAST(0 AS DOUBLE) END AS z_score,
       CASE WHEN abs(CASE WHEN var_ > 0 THEN (rate_a - rate_b) / sqrt(var_)
                          ELSE CAST(0 AS DOUBLE) END)
                > {_AB_ZCRIT} THEN 1 ELSE 0 END AS significant
FROM withvar
"""


# ------------------------------------------------------------ power analysis
# Experiment-design companion to q_ev_ab_test: at the CURRENT arm sizes
# and pooled conversion rate, the minimum detectable effect at 5%
# two-sided significance and 80% power
#   MDE = (z_α + z_β) · sqrt(p(1-p)·(1/n_a + 1/n_b))
# and the per-arm sample size needed to detect a 1-point absolute lift
#   n_req = (z_α + z_β)² · 2·p(1-p) / 0.01²
# — the "how long must this test run" table. z constants are identical
# literals in both dialects; everything else is integer counts, one
# sqrt, a few IEEE ops. Scale shape: one user-grain aggregate + a 2-row
# reduction (the ab_test topology).

_PW_ZA = 1.959964  # two-sided 5%
_PW_ZB = 0.841621  # 80% power
_PW_TARGET = 0.01  # 1-point absolute lift
# coefficients folded ONCE in Python and injected as identical literals:
# DuckDB's bind-time folding of z*z*2.0 (decimal literal in the chain)
# lands 1 ulp off Spark's runtime double chain otherwise
_PW_Z = _PW_ZA + _PW_ZB
_PW_C2 = _PW_Z * _PW_Z * 2.0
_PW_T2 = _PW_TARGET * _PW_TARGET


def q_ev_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= _AB_CONV_MIN,
                1,
            ).otherwise(0).alias("conv")
        )
        .select(
            F.expr(
                "CAST(conv(substr(md5(concat('ab:', CAST(user_id AS STRING))),"
                " 1, 15), 16, 10) AS BIGINT) % 2"
            ).alias("variant"),
            "conv",
        )
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    a = arms.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("k").alias("conv_a")
    )
    b = arms.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("k").alias("conv_b")
    )
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    mde = F.lit(_PW_Z) * F.sqrt(
        pp
        * (F.lit(1).cast("double") - pp)
        * (
            F.lit(1).cast("double") / F.col("n_a").cast("double")
            + F.lit(1).cast("double") / F.col("n_b").cast("double")
        )
    )
    n_req = (
        F.lit(_PW_C2)
        * pp
        * (F.lit(1).cast("double") - pp)
        / F.lit(_PW_T2)
    )
    return a.join(F.broadcast(b)).select(
        "n_a",
        "n_b",
        pp.alias("pooled_rate"),
        mde.alias("mde_abs"),
        n_req.alias("n_required_per_arm"),
        F.when(
            F.least(F.col("n_a"), F.col("n_b")).cast("double") >= n_req, 1
        ).otherwise(0).alias("powered_for_target"),
    )


_POWER_SQL = f"""
WITH users AS (
  SELECT CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= {_AB_CONV_MIN} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS k
  FROM users GROUP BY 1
),
ab AS (
  SELECT a.n AS n_a, a.k AS conv_a, b.n AS n_b, b.k AS conv_b
  FROM (SELECT n, k FROM arms WHERE variant = 0) a,
       (SELECT n, k FROM arms WHERE variant = 1) b
),
base AS (
  SELECT n_a, n_b,
         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
  FROM ab
)
SELECT n_a, n_b, pp AS pooled_rate,
       {_PW_Z!r} * sqrt(pp * (CAST(1 AS DOUBLE) - pp)
         * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
            + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))) AS mde_abs,
       {_PW_C2!r} * pp * (CAST(1 AS DOUBLE) - pp)
         / {_PW_T2!r} AS n_required_per_arm,
       CASE WHEN CAST(LEAST(n_a, n_b) AS DOUBLE)
                 >= {_PW_C2!r} * pp
                      * (CAST(1 AS DOUBLE) - pp) / {_PW_T2!r}
            THEN 1 ELSE 0 END AS powered_for_target
FROM base
"""


# ------------------------------------------------------------ bootstrap CI
# Deterministic Poisson bootstrap on the purchase-conversion rate: each
# of B=32 replicates reweights every event by a pseudo-Poisson(1) count
# drawn from an id-hash uniform against INTEGER CDF thresholds (the
# transcendental e^-1 CDF steps are baked in as integer constants on the
# 2^20 grid — no engine evaluates exp), the per-replicate rate is one
# integer division, and the CI is read off order statistics of the 32
# replicate rates. This is the production error-bar pattern for metrics
# over data too large to resample for real: one pass, map-side ×B
# weighting, B-row state. Rule of thumb at 100 TB: the ×B explode is
# map-side only — partial aggregation collapses it to B rows per
# partition before the shuffle.

_BS_B = 32
_BS_M = 1 << 20
# Poisson(1) CDF steps floor-scaled to the 2^20 grid: P(X<=k) for k=0..3
_BS_T = (385749, 771499, 964373, 1028665)


def q_ev_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    point = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    reps = spark.range(0, _BS_B).select(F.col("id").alias("b"))
    w_expr = (
        f"CASE WHEN u < {_BS_T[0]} THEN 0 "
        f"WHEN u < {_BS_T[1]} THEN 1 "
        f"WHEN u < {_BS_T[2]} THEN 2 "
        f"WHEN u < {_BS_T[3]} THEN 3 ELSE 4 END"
    )
    rates = (
        ev.join(F.broadcast(reps))  # 32-row lattice: map-side weighting
        .select(
            "b",
            "conv",
            (
                F.expr(
                    "CAST(conv(substr(md5(concat('bs', CAST(b AS STRING),"
                    " ':', CAST(event_id AS STRING))), 1, 15), 16, 10)"
                    " AS BIGINT)"
                )
                % _BS_M
            ).alias("u"),
        )
        .select("b", "conv", F.expr(w_expr).alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("den"),
            F.sum(F.col("w") * F.col("conv")).cast("bigint").alias("num"),
        )
        .select(
            "b",
            (F.col("num").cast("double") / F.col("den").cast("double"))
            .alias("rate"),
        )
    )
    w = Window.orderBy("rate", "b")
    ranked = rates.withColumn("rn", F.row_number().over(w))
    lo = ranked.filter(F.col("rn") == 2).select(F.col("rate").alias("ci_lo"))
    hi = ranked.filter(F.col("rn") == _BS_B - 1).select(
        F.col("rate").alias("ci_hi")
    )
    return (
        point.join(F.broadcast(lo))
        .join(F.broadcast(hi))
        .select(
            "n_events",
            "n_conv",
            (F.col("n_conv").cast("double") / F.col("n_events").cast("double"))
            .alias("point_rate"),
            F.lit(_BS_B).cast("bigint").alias("n_replicates"),
            "ci_lo",
            "ci_hi",
        )
    )


def _bootstrap_sql() -> str:
    w_expr = (
        f"CASE WHEN u < {_BS_T[0]} THEN 0 "
        f"WHEN u < {_BS_T[1]} THEN 1 "
        f"WHEN u < {_BS_T[2]} THEN 2 "
        f"WHEN u < {_BS_T[3]} THEN 3 ELSE 4 END"
    )
    return f"""
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(conv) AS BIGINT) AS n_conv
  FROM ev
),
reps AS (SELECT t.i AS b FROM unnest(range(0, {_BS_B})) t(i)),
drawn AS (
  SELECT b, conv,
         CAST(('0x' || substr(md5('bs' || CAST(b AS VARCHAR) || ':'
                || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_BS_M} AS u
  FROM ev, reps
),
weighted AS (SELECT b, conv, {w_expr} AS w FROM drawn),
rates AS (
  SELECT b, CAST(SUM(w * conv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS rate
  FROM weighted GROUP BY b
),
ranked AS (
  SELECT rate, ROW_NUMBER() OVER (ORDER BY rate, b) AS rn FROM rates
)
SELECT n_events, n_conv,
       CAST(n_conv AS DOUBLE) / CAST(n_events AS DOUBLE) AS point_rate,
       CAST({_BS_B} AS BIGINT) AS n_replicates,
       (SELECT rate FROM ranked WHERE rn = 2) AS ci_lo,
       (SELECT rate FROM ranked WHERE rn = {_BS_B} - 1) AS ci_hi
FROM point
"""


QUERIES = {
    "q_ev_tumbling_hourly": q_ev_tumbling_hourly,
    "q_ev_asof_purchase": q_ev_asof_purchase,
    "q_ev_range_pairs": q_ev_range_pairs,
    "q_ev_attribution": q_ev_attribution,
    "q_ev_approx_quantiles": q_ev_approx_quantiles,
    "q_ev_rfm": q_ev_rfm,
    "q_ev_resample": q_ev_resample,
    "q_ev_changepoints": q_ev_changepoints,
    "q_ev_forecast": q_ev_forecast,
    "q_ev_funnel_latency": q_ev_funnel_latency,
    "q_ev_lift": q_ev_lift,
    "q_ev_kmv_windows": q_ev_kmv_windows,
    "q_ev_audience_overlap": q_ev_audience_overlap,
    "q_ev_hll_union": q_ev_hll_union,
    "q_ev_percentiles": q_ev_percentiles,
    "q_ev_sessionize": q_ev_sessionize,
    "q_ev_dedup_content": q_ev_dedup_content,
    "q_ev_json_props": q_ev_json_props,
    "q_ev_user_journey": q_ev_user_journey,
    "q_ev_kmv_distinct": q_ev_kmv_distinct,
    "q_ev_funnel": q_ev_funnel,
    "q_ev_cohort_retention": q_ev_cohort_retention,
    "q_ev_sliding_counts": q_ev_sliding_counts,
    "q_ev_salted_distinct": q_ev_salted_distinct,
    "q_ev_pagerank": q_ev_pagerank,
    "q_ev_cms_heavy": q_ev_cms_heavy,
    "q_ev_bloom": q_ev_bloom,
    "q_ev_hll_distinct": q_ev_hll_distinct,
    "q_ev_anomaly": q_ev_anomaly,
    "q_ev_top_paths": q_ev_top_paths,
    "q_ev_bot_detect": q_ev_bot_detect,
    "q_ev_ltv": q_ev_ltv,
    "q_ev_incremental_agg": q_ev_incremental_agg,
    "q_ev_key_skew": q_ev_key_skew,
    "q_ev_asof_nearest": q_ev_asof_nearest,
    "q_ev_gini": q_ev_gini,
    "q_ev_predictability": q_ev_predictability,
    "q_ev_scd2": q_ev_scd2,
    "q_ev_psi_drift": q_ev_psi_drift,
    "q_ev_markov_attribution": q_ev_markov_attribution,
    "q_ev_survival": q_ev_survival,
    "q_ev_mad_outliers": q_ev_mad_outliers,
    "q_ev_stickiness": q_ev_stickiness,
    "q_ev_acf": q_ev_acf,
    "q_ev_bootstrap_ci": q_ev_bootstrap_ci,
    "q_ev_ab_test": q_ev_ab_test,
    "q_ev_power_analysis": q_ev_power_analysis,
    "q_ev_watermark_plan": q_ev_watermark_plan,
    "q_ev_gdpr_erasure": q_ev_gdpr_erasure,
    "q_ev_bursts": q_ev_bursts,
    "q_ev_seasonality": q_ev_seasonality,
    "q_ev_slo_burn": q_ev_slo_burn,
    "q_stream_tumbling_hourly": q_stream_tumbling_hourly,
    "q_stream_sessionize": q_stream_sessionize,
    "q_stream_running_totals": q_stream_running_totals,
    "q_stream_join": q_stream_join,
    "q_stream_left_join": q_stream_left_join,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_enrich": q_stream_enrich,
    "q_stream_heads": q_stream_heads,
    "q_stream_topk": q_stream_topk,
    "q_stream_anomaly": q_stream_anomaly,
    "q_stream_ingest_log": q_stream_ingest_log,
}

ORACLES = {
    "q_ev_tumbling_hourly": _TUMBLING_SQL,
    "q_ev_asof_purchase": _ASOF_SQL,
    "q_ev_range_pairs": _RANGE_SQL,
    "q_ev_attribution": _ATTRIBUTION_SQL,
    "q_ev_approx_quantiles": _hq_sql(),
    "q_ev_rfm": _RFM_SQL,
    "q_ev_resample": _RESAMPLE_SQL,
    "q_ev_changepoints": _CHG_SQL,
    "q_ev_forecast": _FORECAST_SQL,
    "q_ev_funnel_latency": _FUNNEL_LATENCY_SQL,
    "q_ev_lift": _LIFT_SQL,
    "q_ev_kmv_windows": _KMVW_SQL,
    "q_ev_audience_overlap": _AOV_SQL,
    "q_ev_hll_union": _HLL_UNION_SQL,
    "q_ev_percentiles": _PCT_SQL,
    "q_ev_sessionize": _SESSION_SQL,
    "q_ev_dedup_content": _DEDUP_SQL,
    "q_ev_json_props": _JSON_SQL,
    "q_ev_user_journey": _JOURNEY_SQL,
    "q_ev_kmv_distinct": _KMV_SQL,
    "q_ev_funnel": _FUNNEL_SQL,
    "q_ev_cohort_retention": _COHORT_SQL,
    "q_ev_sliding_counts": _SLIDING_SQL,
    "q_ev_salted_distinct": _SALTED_DISTINCT_SQL,
    "q_ev_pagerank": _pagerank_sql(),
    "q_ev_cms_heavy": _cms_sql(),
    "q_ev_bloom": _bloom_sql(),
    "q_ev_hll_distinct": _HLL_SQL,
    "q_ev_anomaly": _ANOMALY_SQL,
    "q_ev_top_paths": _TOP_PATHS_SQL,
    "q_ev_bot_detect": _BOT_SQL,
    "q_ev_ltv": _LTV_SQL,
    "q_ev_incremental_agg": _INC_AGG_SQL,
    "q_ev_key_skew": _key_skew_sql(),
    "q_ev_asof_nearest": _ASOF_NEAREST_SQL,
    "q_ev_gini": _GINI_SQL,
    "q_ev_predictability": _predictability_sql(),
    "q_ev_scd2": _SCD2_SQL,
    "q_ev_psi_drift": _psi_sql(),
    "q_ev_markov_attribution": _markov_sql(),
    "q_ev_survival": _SURVIVAL_SQL,
    "q_stream_tumbling_hourly": _STREAM_TUMBLING_SQL,
    "q_stream_sessionize": _SESSION_SQL,
    "q_stream_running_totals": _RUNNING_TOTALS_SQL,
    "q_stream_join": _RANGE_SQL,
    "q_stream_left_join": _STREAM_LEFT_JOIN_SQL,
    "q_stream_dedup": _STREAM_DEDUP_SQL,
    "q_stream_enrich": _STREAM_ENRICH_SQL,
    "q_stream_heads": _STREAM_HEADS_SQL,
    "q_stream_topk": _STREAM_TOPK_SQL,
    "q_stream_anomaly": _ANOMALY_SQL,
    "q_stream_ingest_log": _STREAM_INGEST_SQL,
    "q_ev_mad_outliers": _MAD_SQL,
    "q_ev_stickiness": _STICKINESS_SQL,
    "q_ev_acf": _acf_sql(),
    "q_ev_bootstrap_ci": _bootstrap_sql(),
    "q_ev_ab_test": _AB_SQL,
    "q_ev_power_analysis": _POWER_SQL,
    "q_ev_watermark_plan": _watermark_plan_sql(),
    "q_ev_gdpr_erasure": _GDPR_SQL,
    "q_ev_bursts": _bursts_sql(),
    "q_ev_seasonality": _SEASONALITY_SQL,
    "q_ev_slo_burn": _SLO_SQL,
}
