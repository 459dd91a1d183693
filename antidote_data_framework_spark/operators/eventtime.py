"""Event-time window operators (batch twins) — SURVEY.md §2B O-48..O-50.

These are the batch halves of the streaming pairs in
``streaming/stream_queries.py``: identical window semantics, so the
streaming results can be asserted equal to these.  Since r11 both
halves emit tie-free integer cents (sum_cents = SUM(floor(value*100
+ 0.5))) — r10 moved the streaming side off ROUND(SUM(double),4) and
this module follows, restoring the documented twin schema (r10
ADVICE #5).  ``F.window`` /
``F.session_window`` group rows by event time, not arrival time — on a
cluster the groupBy shuffles on (window, key), and AQE coalesces the
mostly-empty buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_window_tumbling",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP)                 AS window_start,
       CAST(time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
       event_type,
       COUNT(*)             AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2, 3
""",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window per event type: count + value sum.
    Spark's window() and DuckDB's time_bucket both align to the epoch,
    so bucket boundaries agree exactly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


@spark_query(
    "q_window_sliding",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 day', e.ts, o.off) AS TIMESTAMP)                 AS window_start,
       CAST(time_bucket(INTERVAL '1 day', e.ts, o.off) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
       COUNT(*)             AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events e
CROSS JOIN (SELECT UNNEST([INTERVAL '0' HOUR, INTERVAL '6' HOUR,
                           INTERVAL '12' HOUR, INTERVAL '18' HOUR]) AS off) o
GROUP BY 1, 2
""",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows sliding every 6h — each event lands in 4 windows.
    The oracle reproduces Spark's overlapping-window semantics by
    unioning 4 offset tumbling bucketings (epoch-aligned, like Spark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_cents",
        )
    )


@spark_query(
    "q_window_session",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM ordered
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP)                      AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       COUNT(*)                         AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM sess
GROUP BY user_id, sess_id
""",
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user.

    Spark's session_window works in batch: a session is [first_ts,
    last_ts + gap), merging events strictly less than `gap` apart.
    The oracle is the classic gap-and-islands rewrite with the same
    >=-gap split rule.  At scale this is one shuffle on user_id;
    Spark merges candidate sessions after partial aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("sum_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_cents",
        )
    )


@spark_query(
    "q_events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n_events,
       ROUND((n_events - AVG(n_events) OVER (PARTITION BY event_type))
             / NULLIF(STDDEV_SAMP(n_events) OVER (PARTITION BY event_type), 0),
             4) AS zscore,
       ABS((n_events - AVG(n_events) OVER (PARTITION BY event_type))
           / NULLIF(STDDEV_SAMP(n_events) OVER (PARTITION BY event_type), 0)) > 2.0
           AS is_anomaly
FROM daily
""",
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score of each day's event count
    against its event type's daily distribution, flagging |z| > 2.

    Two-stage plan: the daily rollup first shrinks the fact table to
    |types|×|days| rows, THEN the unbounded window computes μ/σ over
    that tiny frame — the window never sees raw events, so at 100 TB
    the windowed exchange carries a few thousand rows.  NULLIF guards
    the σ=0 single-day types."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("event_type")
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.nullif(
        F.stddev_samp("n_events").over(w), F.lit(0)
    )
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )
