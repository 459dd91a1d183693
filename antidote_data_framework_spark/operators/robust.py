"""Robust estimation operators — Theil–Sen trend, AR(1) Yule–Walker
forecast, and a Huber M-estimator of location, all per event_type over
the events fixture.  Public textbook methods (Theil 1950 / Sen 1968;
Yule–Walker equations; Huber, "Robust Estimation of a Location
Parameter", 1964).

Why these three as engine operators: production telemetry pipelines
need trend/forecast/center estimates that do not fall over on the
outliers the fixture's z-score/MAD detectors (timeseries.py,
stats_nonparam.py) merely FLAG.  Each is a composition of exact
aggregations — no UDF, no iteration state:

- Theil–Sen: pairwise daily slopes → exact median.  The pairwise
  expansion is per-GROUP O(days²), bounded by pre-aggregating events
  to one row per (type, day) FIRST — at 100 TB the raw rows never
  enter the self-join; only the tiny daily series does (30 days →
  435 pairs per group).  This pre-agg-then-expand shape is the same
  discipline as the mode/median split in q_agg_exact_median_mode.
- AR(1): lag-1 autocovariance over the daily series via a window lag
  — one shuffle on (type), window over ≤ days rows per group.
- Huber: the IRLS fixpoint is UNROLLED to two fixed iterations (the
  engine's standing trick for "iterative" algorithms that SQL can
  still express: q_bigram_lm_heldout's smoothing, q_glm's IRLS is the
  driver-looped contrast) so both engines run the identical closed
  dataflow: median/MAD → weighted mean → weighted mean.  Two
  iterations from the median start point is the classic one-step
  (fully efficient) M-estimator plus one polish step.

Determinism: day index is floor(epoch_us/86.4e9) relative to the
group's first day (small numbers keep double error far from the
round(…,4) edge); medians are interpolated percentile_cont in both
engines (parity established by q_agg_exact_median_mode); all doubles
rounded at the output edge only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table

_US_PER_DAY = 86_400_000_000

# Shared oracle CTE: one row per (event_type, relative day), y = daily sum.
_DAILY_CTE = f"""
daily0 AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / {_US_PER_DAY}) AS BIGINT) AS d_abs,
         SUM(value) AS y
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT event_type, d_abs - MIN(d_abs) OVER (PARTITION BY event_type) AS d, y
  FROM daily0
)"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / _US_PER_DAY).cast("bigint").alias("d_abs"),
    ).agg(F.sum("value").alias("y"))
    w = Window.partitionBy("event_type")
    # Both consumers (Theil–Sen: self-join a/b + intercept pass; AR(1):
    # mu + lagged + final join) read this types×days-bounded series
    # three times each, re-running the events scan + aggregation per
    # read before this checkpoint (r12, guide §5).
    return daily0.select(
        "event_type",
        (F.col("d_abs") - F.min("d_abs").over(w)).alias("d"),
        "y",
    ).localCheckpoint()


@spark_query(
    "q_theilsen_trend",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
slopes AS (
  SELECT a.event_type, (b.y - a.y) / (b.d - a.d) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
med AS (
  SELECT event_type, quantile_cont(s, 0.5) AS slope_raw
  FROM slopes GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT)                               AS n_days,
       ROUND(MAX(m.slope_raw), 4)                             AS slope,
       ROUND(quantile_cont(d.y - m.slope_raw * d.d, 0.5), 4)  AS intercept
FROM daily d JOIN med m ON d.event_type = m.event_type
GROUP BY d.event_type
""",
)
def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event_type: slope = median of all
    pairwise daily slopes, intercept = median of (y − slope·d) — the
    50%-breakdown alternative to the OLS fit in q_grouped_linreg.

    Plan: daily pre-agg (shuffle on (type, day)) → per-type pairwise
    self-join of the TINY daily series → exact median per type → one
    broadcast-join back for the intercept residuals.  MAX(slope_raw)
    in the final agg is a no-op carry (one med row per type)."""
    daily = _daily(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.d") - F.col("a.d"))).alias("s"),
    )
    med = slopes.groupBy("event_type").agg(
        F.percentile("s", F.lit(0.5)).alias("slope_raw")
    )
    return (
        daily.join(bcast(med, "1-row median aggregate"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max("slope_raw"), 4).alias("slope"),
            F.round(
                F.percentile(F.col("y") - F.col("slope_raw") * F.col("d"), F.lit(0.5)),
                4,
            ).alias("intercept"),
        )
    )


@spark_query(
    "q_ar1_forecast",
    oracle=f"""
WITH {_DAILY_CTE.strip()},
mu AS (
  SELECT event_type, AVG(y) AS mu, MAX(d) AS d_last
  FROM daily GROUP BY event_type
),
lagged AS (
  SELECT event_type, d, y,
         LAG(y) OVER (PARTITION BY event_type ORDER BY d) AS yl
  FROM daily
),
phi AS (
  SELECT l.event_type,
         SUM((l.y - m.mu) * (l.yl - m.mu)) / SUM((l.yl - m.mu) * (l.yl - m.mu)) AS phi
  FROM lagged l JOIN mu m ON l.event_type = m.event_type
  WHERE l.yl IS NOT NULL
  GROUP BY l.event_type
)
SELECT m.event_type,
       CAST(COUNT(*) AS BIGINT)  AS n_days,
       ROUND(MAX(m.mu), 4)       AS mu,
       ROUND(MAX(p.phi), 4)      AS phi,
       ROUND(MAX(m.mu) + MAX(p.phi) * (MAX(CASE WHEN d.d = m.d_last THEN d.y END) - MAX(m.mu)), 4) AS forecast
FROM daily d
JOIN mu m  ON d.event_type = m.event_type
JOIN phi p ON d.event_type = p.event_type
GROUP BY m.event_type
""",
)
def q_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) one-step forecast of each event_type's daily total:
    φ from the Yule–Walker lag-1 estimator (autocovariance over
    variance of the lagged series), forecast = μ + φ·(y_last − μ).

    Missing days are treated as series gaps (lag crosses them) — the
    gap-filling twin is q_timeseries_gapfill; composing the two gives
    the calendar-regular variant.  One window pass + two tiny
    broadcast aggregates; nothing touches raw events after the daily
    pre-agg."""
    daily = _daily(spark, sf_dir)
    mu = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"), F.max("d").alias("d_last")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.withColumn("yl", F.lag("y").over(w)).filter(
        F.col("yl").isNotNull()
    )
    phi = (
        lagged.join(bcast(mu, "1-row global-mean aggregate"), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum((F.col("y") - F.col("mu")) * (F.col("yl") - F.col("mu")))
                / F.sum((F.col("yl") - F.col("mu")) * (F.col("yl") - F.col("mu")))
            ).alias("phi")
        )
    )
    return (
        daily.join(bcast(mu, "1-row global-mean aggregate"), "event_type")
        .join(bcast(phi, "per-event_type AR coefficient (<=5 rows)"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max("mu"), 4).alias("mu"),
            F.round(F.max("phi"), 4).alias("phi"),
            F.round(
                F.max("mu")
                + F.max("phi")
                * (
                    F.max(F.when(F.col("d") == F.col("d_last"), F.col("y")))
                    - F.max("mu")
                ),
                4,
            ).alias("forecast"),
        )
    )


_HUBER_C = 1.345  # 95%-efficiency tuning constant
_MAD_SIGMA = 1.4826  # MAD -> sigma consistency factor


@spark_query(
    "q_huber_mean",
    oracle=f"""
WITH start AS (
  SELECT event_type,
         quantile_cont(value, 0.5) AS m0
  FROM events GROUP BY event_type
),
scale AS (
  SELECT e.event_type,
         MAX(s.m0) AS m0,
         GREATEST({_MAD_SIGMA} * quantile_cont(ABS(e.value - s.m0), 0.5), 1e-9) AS s
  FROM events e JOIN start s ON e.event_type = s.event_type
  GROUP BY e.event_type
),
it1 AS (
  SELECT e.event_type,
         SUM(LEAST(1.0, {_HUBER_C} * sc.s / GREATEST(ABS(e.value - sc.m0), 1e-12)) * e.value)
         / SUM(LEAST(1.0, {_HUBER_C} * sc.s / GREATEST(ABS(e.value - sc.m0), 1e-12))) AS m1
  FROM events e JOIN scale sc ON e.event_type = sc.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(sc.m0), 4)     AS median_v,
       ROUND(MAX(sc.s), 4)      AS scale_v,
       ROUND(AVG(e.value), 4)   AS mean_v,
       ROUND(SUM(LEAST(1.0, {_HUBER_C} * sc.s / GREATEST(ABS(e.value - i.m1), 1e-12)) * e.value)
             / SUM(LEAST(1.0, {_HUBER_C} * sc.s / GREATEST(ABS(e.value - i.m1), 1e-12))), 4) AS huber_mean
FROM events e
JOIN scale sc ON e.event_type = sc.event_type
JOIN it1 i    ON e.event_type = i.event_type
GROUP BY e.event_type
""",
)
def q_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimate of each event_type's central value: start at
    the median, scale = 1.4826·MAD (σ-consistent), then two unrolled
    IRLS re-weighting passes with ψ-weights min(1, c·s/|v−m|),
    c = 1.345.  Emits median / scale / plain mean / huber_mean so the
    outlier pull on the mean is visible in one row per type.

    Each pass is one groupBy over events joined to the previous
    5-row estimate (broadcast) — the fixed two-pass unroll keeps the
    whole thing a static dataflow both engines execute identically;
    the epsilon floors (1e-9 scale, 1e-12 residual) are shared
    constants, not engine-side guards."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    start = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m0")
    )
    scale = (
        ev.join(bcast(start, "per-event_type start agg (<=5 rows)"), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("m0").alias("m0"),
            F.greatest(
                F.lit(_MAD_SIGMA)
                * F.percentile(F.abs(F.col("value") - F.col("m0")), F.lit(0.5)),
                F.lit(1e-9),
            ).alias("s"),
        )
    )

    def _w(center):
        return F.least(
            F.lit(1.0),
            F.lit(_HUBER_C)
            * F.col("s")
            / F.greatest(F.abs(F.col("value") - center), F.lit(1e-12)),
        )

    it1 = (
        ev.join(bcast(scale, "per-event_type scale agg (<=5 rows)"), "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum(_w(F.col("m0")) * F.col("value")) / F.sum(_w(F.col("m0")))).alias("m1")
        )
    )
    return (
        ev.join(bcast(scale, "per-event_type scale agg (<=5 rows)"), "event_type")
        .join(bcast(it1, "per-event_type Huber iterate (<=5 rows)"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("m0"), 4).alias("median_v"),
            F.round(F.max("s"), 4).alias("scale_v"),
            F.round(F.avg("value"), 4).alias("mean_v"),
            F.round(
                F.sum(_w(F.col("m1")) * F.col("value")) / F.sum(_w(F.col("m1"))), 4
            ).alias("huber_mean"),
        )
    )
