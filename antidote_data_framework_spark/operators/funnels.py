"""Product-analytics operators over the event stream: funnel and
cohort retention — the query shapes an events table exists for.

Both are pure conditional-aggregation + join plans (one shuffle per
stage on user_id); week arithmetic is integer day-diff from a fixed
anchor on BOTH engines (epoch-aligned bucket functions differ between
engines: DuckDB time_bucket anchors weeks to 2000-01-03, Spark window
to 1970-01-01 — integer arithmetic sidesteps the mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_events_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t0
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s WHERE t0 IS NOT NULL) AS n_signup,
       (SELECT COUNT(*) FROM c)                      AS n_signup_click,
       (SELECT COUNT(*) FROM p)                      AS n_signup_click_purchase
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: each stage
    counts users whose stage event strictly FOLLOWS their previous
    stage (conditional min-timestamp per stage, then a ranged join to
    the next stage).  Three user_id-keyed aggregations — at 100 TB
    each is one shuffle of |users| rows, and the stages pipeline."""
    events = load_table(spark, sf_dir, "events")
    s = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t0")
    ).filter(F.col("t0").isNotNull())
    c = (
        events.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    n_s = s.agg(F.count(F.lit(1)).alias("n_signup"))
    n_c = c.agg(F.count(F.lit(1)).alias("n_signup_click"))
    n_p = p.agg(F.count(F.lit(1)).alias("n_signup_click_purchase"))
    return n_s.crossJoin(n_c).crossJoin(n_p)


@spark_query(
    "q_retention_cohort",
    oracle="""
WITH weeks AS (
  SELECT user_id,
         CAST(FLOOR(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7.0) AS BIGINT) AS wk
  FROM events
),
first_wk AS (SELECT user_id, MIN(wk) AS cohort_week FROM weeks GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, wk FROM weeks)
SELECT f.cohort_week,
       a.wk - f.cohort_week AS week_offset,
       COUNT(*) AS n_active_users
FROM first_wk f JOIN activity a ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each later week they return.  Weeks are integer
    day-offsets from a fixed anchor (engine-portable; see module
    docstring).  Shape: two user-keyed aggregations + one join —
    the cohort table is |users| rows, activity is |user-weeks|."""
    events = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01").cast("timestamp")
    weeks = events.select(
        "user_id",
        F.floor(F.datediff(F.col("ts"), anchor) / 7.0).cast("long").alias("wk"),
    )
    first_wk = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = weeks.distinct()
    return (
        activity.join(first_wk, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@spark_query(
    "q_scd2_intervals",
    oracle="""
SELECT user_id, event_type,
       CAST(ts AS TIMESTAMP)                        AS valid_from,
       CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to,
       (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
                                                    AS is_current
FROM events
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval construction: turn a change log into
    [valid_from, valid_to) validity intervals per key — each event's
    interval closes at the NEXT event's timestamp (NULL = still
    current).

    One window per user (lead over ts, event_id tie-break).  This is
    the standard dimension-history builder: at 100 TB it is one
    shuffle on the key, and the result joins back to facts with the
    as-of pattern (q_join_asof) for point-in-time lookups."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@spark_query(
    "q_path_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def q_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path transition matrix: counts of consecutive event-type
    pairs per user ordered by time — the Markov-chain input for
    journey analysis (what follows a signup? what precedes an
    error?).

    The lead window rides one shuffle on user_id; the transition
    aggregate then shrinks to |types|² rows, so the expensive stage is
    a single pass regardless of scale."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@spark_query(
    "q_attribution_touch",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       MIN(c.ts) AS first_touch_ts,
       MAX(c.ts) AS last_touch_ts,
       COUNT(*)  AS n_touches
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND c.ts >  p.ts - INTERVAL 7 DAY
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
""",
)
def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-touch attribution: for every purchase, the FIRST and
    LAST click by the same user in the preceding 7 days, plus the
    touch count — first-touch / last-touch attribution in one pass.

    The purchase-click pairing is an equi-join on user_id with the
    7-day window as a residual range predicate: per-user event streams
    are bounded (the blocking argument of q_jaccard_block), so the
    join fans out per user, not per table.  At 100 TB with unbounded
    per-user histories, pre-bin both sides by week and join on
    (user, week) pairs — the q_join_range_binned rewrite — or compute
    last-touch via a running window (max click-ts carried forward)
    and keep the join only for first-touch."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy(F.col("purchase_id"), F.col("p_user").alias("user_id"))
        .agg(
            F.min("c_ts").alias("first_touch_ts"),
            F.max("c_ts").alias("last_touch_ts"),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("purchase_id")
    )


@spark_query(
    "q_scd2_asof_join",
    oracle="""
WITH dim AS (
  SELECT user_id, event_type AS state,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM events
),
fact AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_orderdate + INTERVAL 27 YEAR AS TIMESTAMP) AS order_ts
  FROM orders
)
SELECT o.o_orderkey, o.o_custkey AS user_id,
       o.order_ts,
       d.state AS state_at_order,
       CAST(d.valid_from AS TIMESTAMP) AS state_since
FROM fact o
JOIN dim d
  ON d.user_id = o.o_custkey
 AND d.valid_from <= o.order_ts
 AND (d.valid_to IS NULL OR d.valid_to > o.order_ts)
ORDER BY o.o_orderkey
""",
)
def q_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 temporal join — the CONSUMER side of q_scd2_intervals:
    each order picks up the dimension version (the user's event-state
    history as a stand-in SCD2 dim) valid AT order time, via the
    half-open interval predicate ``valid_from <= t < valid_to``.

    Fixture bridge (VERDICT r6 #1): the dim's validity intervals live
    in Jan 2024 (events) while raw order dates end in 2001, so the
    interval predicate could never fire.  The fact timeline is aligned
    into the dim era by the same fixed +27-year calendar shift as
    q_join_asof_nearest (``add_months`` / ``+ INTERVAL 27 YEAR``,
    leap-day-clamped identically in both engines), making the tiling
    semantics — including the open-ended last version — execute on
    ~10k matched orders at sf0.1.

    This is how every warehouse fact query reads history ("what
    segment was the customer in when they ordered?").  The interval
    build is one window pass; the temporal join is an equi-join on the
    dimension's natural key with the interval check as residual — the
    same user-blocked bounded fan-out as q_attribution_touch.  The
    half-open intervals tile time exactly, so each order matches AT
    MOST one version (exactly one when the dim predates the fact) —
    no post-join dedup.  At 100 TB, SCD2 dims are compact relative to
    facts; a date-binned join (q_join_range_binned) removes residual
    skew if a natural key's history is huge."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_ts", F.add_months("o_orderdate", 27 * 12).cast("timestamp")
    )
    return (
        o.join(
            dim,
            (dim.user_id == o.o_custkey)
            & (F.col("valid_from") <= F.col("order_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") > F.col("order_ts"))
            ),
        )
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            "order_ts",
            F.col("state").alias("state_at_order"),
            F.col("valid_from").alias("state_since"),
        )
        .orderBy("o_orderkey")
    )


@spark_query(
    "q_rfm_segments",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         date_diff('day', MAX(ts), TIMESTAMP '2024-02-01') AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
th AS (
  SELECT quantile_cont(recency_days, 0.5) AS r_med,
         quantile_cont(frequency, 0.5) AS f_med,
         quantile_cont(monetary_cents, 0.5) AS m_med
  FROM per_user
),
seg AS (
  SELECT CASE WHEN recency_days <= r_med THEN 'R-hi' ELSE 'R-lo' END
         || '/' ||
         CASE WHEN frequency > f_med THEN 'F-hi' ELSE 'F-lo' END
         || '/' ||
         CASE WHEN monetary_cents > m_med THEN 'M-hi' ELSE 'M-lo' END AS segment,
         recency_days, frequency, monetary_cents
  FROM per_user CROSS JOIN th
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(recency_days), 4) AS avg_recency,
       ROUND(AVG(frequency), 4) AS avg_frequency,
       ROUND(AVG(monetary_cents), 4) AS avg_monetary_cents
FROM seg GROUP BY segment
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user Recency (days since last
    purchase, anchored at a fixed analysis date), Frequency, and
    Monetary value, split hi/lo at the population MEDIANS into 8
    segments — the classic lifecycle-marketing cube ("R-hi/F-hi/M-hi"
    = champions, "R-lo/F-lo/M-lo" = lost).

    Same scale design as q_curriculum_bands: thresholds come from ONE
    percentile aggregate over the per-user frame (never a global
    NTILE sort), broadcast as a 1-row frame; segment assignment is a
    codegen CASE; the output is bounded at 8 rows.  Cost at 100 TB:
    one purchase-filtered shuffle to per-user grain, one tiny agg.

    Determinism: recency in whole days from exact timestamp diff;
    medians are interpolated doubles computed identically in both
    engines; money in exact cents; averages rounded 4 dp.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.lit("2024-02-01").cast("timestamp"), F.max("ts")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "monetary_cents"
        ),
    )
    th = per_user.agg(
        F.expr("percentile(recency_days, 0.5D)").alias("r_med"),
        F.expr("percentile(frequency, 0.5D)").alias("f_med"),
        F.expr("percentile(monetary_cents, 0.5D)").alias("m_med"),
    )
    seg = per_user.crossJoin(bcast(th, "1-row threshold aggregate")).select(
        F.concat(
            F.when(F.col("recency_days") <= F.col("r_med"), "R-hi").otherwise("R-lo"),
            F.lit("/"),
            F.when(F.col("frequency") > F.col("f_med"), "F-hi").otherwise("F-lo"),
            F.lit("/"),
            F.when(F.col("monetary_cents") > F.col("m_med"), "M-hi").otherwise("M-lo"),
        ).alias("segment"),
        "recency_days",
        "frequency",
        "monetary_cents",
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("recency_days"), 4).alias("avg_recency"),
        F.round(F.avg("frequency"), 4).alias("avg_frequency"),
        F.round(F.avg("monetary_cents"), 4).alias("avg_monetary_cents"),
    )


@spark_query(
    "q_gaps_islands_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
),
grp AS (
  SELECT user_id, d,
         d - INTERVAL 1 DAY * ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
           AS island_key
  FROM days
),
islands AS (
  SELECT user_id, island_key, CAST(COUNT(*) AS BIGINT) AS len
  FROM grp GROUP BY user_id, island_key
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM islands
GROUP BY user_id
HAVING MAX(len) >= 3
""",
)
def q_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the classic date-minus-row_number island key (consecutive days
    share a constant difference), reporting active days, streak
    count, and longest streak for users with a >= 3-day streak — the
    engagement/retention statistic behind "N-day streak" features.

    One distinct-day reduction, one user-partitioned window (the sort
    is per-user, never global), two bounded aggregations.  At 100 TB
    the window state is |active days per user| — calendar-bounded.

    Determinism: day truncation is exact; island arithmetic is exact
    timestamp/integer math; HAVING + integer outputs, nothing
    floating anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        (
            F.col("d").cast("long")
            - F.row_number().over(w) * F.lit(86400)
        ).alias("island_key"),
    )
    islands = grp.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .filter(F.col("longest_streak") >= 3)
    )


@spark_query(
    "q_time_to_convert",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT c.user_id,
         MIN(date_diff('second', c.ts, p.ts)) AS secs_to_convert
  FROM clicks c
  JOIN purchases p
    ON p.user_id = c.user_id
   AND p.ts > c.ts
   AND p.ts <= c.ts + INTERVAL 24 HOURS
  GROUP BY c.user_id, c.ts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(ROUND(quantile_cont(secs_to_convert, 0.50), 0) AS BIGINT) AS p50_secs,
       CAST(ROUND(quantile_cont(secs_to_convert, 0.90), 0) AS BIGINT) AS p90_secs,
       CAST(MIN(secs_to_convert) AS BIGINT) AS min_secs,
       CAST(MAX(secs_to_convert) AS BIGINT) AS max_secs
FROM conv
""",
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every click that converts
    within 24 h, the latency to the FIRST subsequent purchase by the
    same user; reported as conversion count + p50/p90/min/max
    latency — the funnel-velocity metric next to q_events_funnel
    (did they convert) and q_attribution_touch (which touch gets
    credit).

    The click→purchase pairing is an equi-join on user_id with a
    range residual (the binned-range-join rewrite of
    q_join_range_binned applies verbatim when the time window spans
    many partitions); MIN per click collapses the fan-out before the
    percentile aggregation.

    Determinism: second-granularity integer latencies; exact-count
    percentile interpolation identical cross-engine (proven pattern);
    ROUND->BIGINT outputs.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        clicks.join(purchases, "user_id")
        .filter(
            (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id", "cts")
        .agg(
            F.min(
                F.unix_timestamp("pts") - F.unix_timestamp("cts")
            ).alias("secs_to_convert")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.expr("percentile(secs_to_convert, 0.50D)"), 0)
        .cast("long")
        .alias("p50_secs"),
        F.round(F.expr("percentile(secs_to_convert, 0.90D)"), 0)
        .cast("long")
        .alias("p90_secs"),
        F.min("secs_to_convert").alias("min_secs"),
        F.max("secs_to_convert").alias("max_secs"),
    )
