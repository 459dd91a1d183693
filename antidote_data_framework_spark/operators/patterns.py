"""Event-sequence analytics: MATCH_RECOGNIZE-style pattern detection,
interval overlap joins, and robust (MAD-based) outlier gating.

These are the row-pattern / temporal-join query shapes SQL:2016 added
to classic engines; Spark has no MATCH_RECOGNIZE, so the engine
re-expresses them with window functions and equi-join + residual
predicates — shapes Catalyst pipelines into ordinary shuffles:

- pattern match = one window sort per user partition (LEAD twice),
  no self-join — at 100 TB this is a single shuffle on user_id and
  the pattern test is a codegen filter;
- interval overlap = equi-join on the day bucket (co-partitioned)
  with the overlap test as a residual predicate — never the
  quadratic theta join;
- MAD gate = two exact-percentile aggregations over a bounded group
  count (|event_type| = 5) joined back broadcast-style.

Determinism notes: event order is totalized by (ts, event_id);
durations are exact epoch-microsecond BIGINTs (both engines store
timestamps at us grain); money-like doubles are lifted to integer
cents via ROUND(value*100) BEFORE any statistic, so medians/MADs land
on exact .0/.5/.25 binary fractions and compare bit-identically
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_event_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_type,
         LEAD(event_type, 1) OVER w AS e1,
         LEAD(event_type, 2) OVER w AS e2,
         LEAD(ts, 2)         OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)   AS n_matches,
       CAST(MIN(ts) AS TIMESTAMP) AS first_start,
       CAST(MAX(t2) AS TIMESTAMP) AS last_end
FROM seq
WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
GROUP BY user_id
""",
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern recognition (MATCH_RECOGNIZE ``PATTERN (V C P)``):
    per user, count strictly-consecutive view→click→purchase runs in
    the (ts, event_id)-totalized event sequence, with the first match
    start and last match end.

    Plan shape: ONE window shuffle on user_id (two LEADs share the
    frame), then a filter + partial-aggregated groupBy — no self-join,
    no explosion; at 100 TB the sort is per-user-partition and AQE
    handles skewed users.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
        F.lead("ts", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("ts").alias("first_start"),
            F.max("t2").alias("last_end"),
        )
    )


@spark_query(
    "q_interval_overlap_join",
    oracle="""
WITH act AS (
  SELECT user_id,
         CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
         MIN(ts) AS a_start, MAX(ts) AS a_end
  FROM events GROUP BY 1, 2
),
inc AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
         MIN(ts) AS i_start, MAX(ts) AS i_end
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT a.day,
       CAST(COUNT(*) AS BIGINT) AS n_overlapping_users,
       CAST(SUM(epoch_us(LEAST(a.a_end, i.i_end))
              - epoch_us(GREATEST(a.a_start, i.i_start))) AS BIGINT)
         AS total_overlap_micros
FROM act a JOIN inc i ON a.day = i.day
WHERE a.a_start <= i.i_end AND i.i_start <= a.a_end
GROUP BY a.day
""",
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join: per-user daily activity intervals
    [min ts, max ts] against the day's incident window (error-event
    span), reporting overlapping users and exact total overlap in
    epoch microseconds.

    Scale shape: the join key is the integer day bucket — an
    EQUI-join (co-partitioned shuffle) with the overlap test left as
    a residual predicate, never a theta/cross join.  Intervals that
    span buckets generalize via the explode-to-buckets trick already
    used by q_join_range_binned (joins.py).  Day index is integer
    datediff from a fixed anchor (engine-portable; see funnels.py on
    why epoch-aligned bucket functions disagree between engines).
    """
    events = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01").cast("timestamp")
    day = F.datediff(F.col("ts"), anchor).cast("long").alias("day")
    act = events.groupBy("user_id", day).agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    inc = (
        events.filter(F.col("event_type") == "error")
        .groupBy(day)
        .agg(F.min("ts").alias("i_start"), F.max("ts").alias("i_end"))
    )
    overlap = F.unix_micros(F.least("a_end", "i_end")) - F.unix_micros(
        F.greatest("a_start", "i_start")
    )
    return (
        act.join(inc, "day")
        .filter((F.col("a_start") <= F.col("i_end")) & (F.col("i_start") <= F.col("a_end")))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_users"),
            F.sum(overlap).alias("total_overlap_micros"),
        )
    )


@spark_query(
    "q_mad_outliers",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med_c
  FROM cents GROUP BY event_type
),
dev AS (
  SELECT cents.event_type, cents.c, ABS(cents.c - med.med_c) AS d
  FROM cents JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad_c
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT)                               AS n_events,
       ROUND(MIN(med.med_c), 2)                               AS median_cents,
       ROUND(MIN(mad.mad_c), 2)                               AS mad_cents,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev
JOIN med ON dev.event_type = med.event_type
JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate: median absolute deviation (median/MAD are
    breakdown-point-0.5 robust, unlike the z-score gate in
    q_events_anomaly_zscore which a single extreme value drags).

    Determinism: values become integer cents first, so the exact
    interpolated percentiles are .0/.5 (median) and .0/.25/.5/.75
    (MAD of half-integer deviations) — exact binary fractions that
    hash-match across engines; the 3×MAD comparison is exact for the
    same reason.  Scale shape: two percentile aggregations grouped on
    a 5-value key; exact percentile holds per-group sorted state, so
    at 100 TB swap ``percentile`` → ``percentile_approx`` (sketch,
    mergeable) and keep the plan — the swap point is this one
    expression.
    """
    events = load_table(spark, sf_dir, "events")
    cents = events.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("c")
    )
    med = cents.groupBy("event_type").agg(F.expr("percentile(c, 0.5D)").alias("med_c"))
    dev = cents.join(bcast(med, "1-row median aggregate"), "event_type").select(
        "event_type", "c", F.abs(F.col("c") - F.col("med_c")).alias("d"), "med_c"
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(d, 0.5D)").alias("mad_c"))
    return (
        dev.join(bcast(mad, "1-row MAD aggregate"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("med_c"), 2).alias("median_cents"),
            F.round(F.min("mad_c"), 2).alias("mad_cents"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad_c"), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_outliers"),
        )
    )


@spark_query(
    "q_event_diversity_gini",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
),
ranked AS (
  SELECT user_id, event_type, c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY c DESC, event_type) AS rn
  FROM counts
),
s AS (
  SELECT user_id, SUM(c) AS n, SUM(c * c) AS ssq
  FROM counts GROUP BY user_id
)
SELECT s.user_id,
       CAST(s.n AS BIGINT) AS n_events,
       r.event_type        AS dominant_type,
       ROUND(CAST(s.n * s.n - s.ssq AS DOUBLE)
             / CAST(s.n * s.n AS DOUBLE), 6) AS gini_impurity
FROM s JOIN ranked r ON r.user_id = s.user_id AND r.rn = 1
""",
)
def q_event_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity score per user: Gini impurity of the
    event-type distribution, 1 - Σ(c_i/n)² = (n² - Σc_i²)/n², plus
    the dominant event type (ties broken lexically).

    Gini is chosen over Shannon entropy DELIBERATELY: entropy needs
    log(), which is only 1-ulp-accurate and library-dependent (Java
    Math.log vs C libm CAN differ in the last bit — not
    hash-matchable), while Gini is an exact integer rational in the
    counts.  Same two-level aggregation shape either way: groupBy
    (user, type) then groupBy user — both partial-aggregated."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), F.col("event_type").asc())
    dominant = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("dominant_type"))
    )
    s = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    return s.join(dominant, "user_id").select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        "dominant_type",
        F.round(
            (F.col("n") * F.col("n") - F.col("ssq")).cast("double")
            / (F.col("n") * F.col("n")).cast("double"),
            6,
        ).alias("gini_impurity"),
    )


@spark_query(
    "q_period_over_period",
    oracle="""
WITH daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
)
SELECT day, cents,
       LAG(cents) OVER (ORDER BY day) AS prev_cents,
       ROUND(CAST(cents - LAG(cents) OVER (ORDER BY day) AS DOUBLE)
             / CAST(LAG(cents) OVER (ORDER BY day) AS DOUBLE), 6)
         AS dod_growth
FROM daily
""",
)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day growth report: daily revenue (exact integer
    cents), the prior day's value (LAG), and the growth ratio — the
    standard reporting shape behind every metrics dashboard.

    The unpartitioned LAG window runs over the DAILY AGGREGATE, whose
    cardinality is |days| (bounded, thousands at most) — the full
    shuffle happens in the partial-aggregated groupBy BEFORE the
    window, so the single-partition window sees only the tiny rollup.
    That ordering (aggregate first, then unpartitioned window) is the
    scale rule; LAG over the raw fact table would serialize the
    world.  Growth is exact-int cents → double division, identical in
    both engines.
    """
    events = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01").cast("timestamp")
    daily = events.groupBy(
        F.datediff(F.col("ts"), anchor).cast("long").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    w = Window.orderBy("day")
    prev = F.lag("cents").over(w)
    return daily.select(
        "day",
        "cents",
        prev.alias("prev_cents"),
        F.round(
            (F.col("cents") - prev).cast("double") / prev.cast("double"), 6
        ).alias("dod_growth"),
    )
