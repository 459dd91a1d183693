"""Time-series regularization: dense-spine gap filling with forward
fill — the resampling step between raw event streams and any
fixed-frequency model input (forecasting, anomaly scoring, features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_timeseries_gapfill",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS day_value
  FROM events
  WHERE user_id % 10 = 0
  GROUP BY 1, 2
),
spans AS (
  SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
),
spine AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM spans
)
SELECT s.user_id,
       strftime(s.day, '%Y-%m-%d') AS day,
       (d.day_value IS NULL) AS is_gap,
       CAST(ROUND(LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS DOUBLE) AS filled_value
FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
ORDER BY s.user_id, s.day
""",
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: per-user daily totals re-sampled onto a DENSE daily
    spine (``sequence`` between each user's first and last active day),
    missing days forward-filled from the last observed value.

    Determinism: daily totals sum in DECIMAL (double event values are
    rounded identically into 6-dp decimals, then summed exactly — the
    money.py discipline), so the forward-filled value stream is
    engine-stable; days are emitted as strings (the engine's no-DATE
    output rule).

    Scale: the spine is generated per user (array of days exploded) —
    rows produced = active-span days, not a cross join against a
    calendar dim; the fill is one window over (user, day).  A 10%%
    user cohort keeps the fixture output readable; the plan is
    cohort-size-independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.col("day_value").isNull().alias("is_gap"),
            F.round(F.last("day_value", ignorenulls=True).over(w), 4)
            .cast("double")
            .alias("filled_value"),
            F.col("day").alias("_ord"),
        )
        .orderBy("user_id", "_ord")
        .select(
            "user_id",
            F.col("day_str").alias("day"),
            "is_gap",
            "filled_value",
        )
    )
