"""Statistical event analytics: resampling, change points, forecast
baseline, histogram quantiles, percentiles, anomaly z-scores, PSI drift,
survival, Markov attribution, MAD outliers, ACF, SLO burn, seasonality,
bursts, predictability, A/B z-test, power analysis, bootstrap CI.

Split from the original single events module (round 6) — see `events.py`
for the registry.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table as T
from ._util import dec, dsum, sql_dsum, tracked_persist as _tp

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

    # NULL convention (degenerate-suite seeds): NULL values are excluded
    # from the histogram AND its n_events, matching percentile()'s
    # NULL-skipping — otherwise the NULL bin lands at opposite ends of
    # the cumulative window in the two engines (Spark ASC = NULLS FIRST,
    # DuckDB = NULLS LAST) and every estimate shifts.
    ev = (
        T(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
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
  SELECT event_type, value, CAST(floor(value * 2) AS BIGINT) AS bin
  FROM events WHERE value IS NOT NULL
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
# pure IEEE ops on identical inputs. Scale shape (round 7): two
# PARTITION-PARALLEL grouped ranks (core.spark_engine.grouped_row_number
# — event_type is low-cardinality, so a partitionBy(type) window would
# put each type's whole event set in one task), one broadcast join of
# the ≤|types| median table back; the only driver-side data is the
# P×|types| rank-offset table.

_MAD_K = 3  # flag |v - med| > K * MAD


def q_ev_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL convention (degenerate-suite seeds): NULL values carry no
    # magnitude and are excluded before the rank-based medians — left
    # in, the NULL row lands at opposite ends of the two engines'
    # ORDER BY value and shifts the median index.
    ev = (
        T(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    # Per-type exact medians by rank, computed PARTITION-PARALLEL
    # (round 7): event_type is a low-cardinality key, so the previous
    # partitionBy(event_type) row_number funnelled each type's whole
    # event set through one task; grouped_row_number (range-partition on
    # (type, value, id), per-partition ranks, broadcast per-(partition,
    # type) offsets) keeps every stage parallel at any |events|.
    from ..catalog import table_rows
    from ..core.spark_engine import grouped_row_number

    n_ev = table_rows(spark, sf_dir, "events")
    # persist: the per-type count feeds BOTH median rank filters
    # (round 11 — unpersisted it re-scanned + re-aggregated per branch)
    n = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).transform(_tp)
    med = (
        grouped_row_number(
            spark, ev, ["event_type"], ["value", "event_id"], "rn",
            n_rows=n_ev,
        )
        .join(F.broadcast(n), "event_type")
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    # dev feeds both the MAD median branch and the final aggregate —
    # persist it, or the deviation computation runs twice
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    ).transform(_tp)
    mad = (
        grouped_row_number(
            spark, dev, ["event_type"], ["d", "event_id"], "rn",
            n_rows=n_ev,
        )
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
WITH ev AS (SELECT event_id, event_type, value FROM events
            WHERE value IS NOT NULL),
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


