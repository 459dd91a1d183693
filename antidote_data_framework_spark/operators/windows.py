"""Window-function operators — SURVEY.md §2B O-20..O-25.

Window evaluation shuffles once on the partition key and sorts within
partitions; multiple frames over the same (partition, order) spec share
one sort.  Determinism rule: any function whose result depends on row
order within ties (row_number, ntile, lag/lead, running frames) gets a
tie-breaking key appended to the ORDER BY; rank/dense_rank are
well-defined under ties and may order by non-unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_window_ranking",
    oracle="""
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER w_unique AS rn,
       NTILE(4)     OVER w_unique AS quartile,
       RANK()       OVER w_year   AS yr_rank,
       DENSE_RANK() OVER w_year   AS yr_dense_rank
FROM orders
WINDOW w_unique AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       w_year   AS (PARTITION BY o_custkey ORDER BY YEAR(o_orderdate))
""",
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions per customer: row_number/ntile over a unique
    sort (price desc, key) and rank/dense_rank over order-year (ties
    expected and deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_year = Window.partitionBy("o_custkey").orderBy(F.year("o_orderdate"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_unique).alias("rn"),
        F.ntile(4).over(w_unique).alias("quartile"),
        F.rank().over(w_year).alias("yr_rank"),
        F.dense_rank().over(w_year).alias("yr_dense_rank"),
    )


@spark_query(
    "q_window_running_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
FROM orders
""",
)
def q_window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: running total and 3-row moving average of
    order value per customer in (date, key) order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@spark_query(
    "q_window_lead_lag",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       epoch_us(ts) - epoch_us(LAG(ts) OVER w)  AS gap_us,
       LEAD(event_type) OVER w                  AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user: microsecond gap to the previous
    event and the next event's type.  Gaps computed on integer
    epoch-microseconds — exact on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@spark_query(
    "q_window_range_frame",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                      RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS n_within_50
FROM customer
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric key: per market segment, how many
    customers sit within ±50 of each customer's account balance.
    RANGE frames are value-based, so tied balances are handled
    identically in both engines."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal").rangeBetween(-50, 50)
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_50"),
    )


@spark_query(
    "q_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rnk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part
) WHERE rnk <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price — the window+filter top-k
    pattern.  At scale Catalyst rewrites rank-limit windows into a
    per-partition top-k (WindowGroupLimit) before the shuffle."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


@spark_query(
    "q_orderby_limit",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by value — Spark plans TakeOrderedAndProject
    (per-partition heap top-k + driver merge), never a full sort.
    Tie-break by key keeps the LIMIT deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@spark_query(
    "q_window_first_last_nth",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value per customer order history.  last_value
    needs the full-partition frame explicitly (the default frame stops
    at CURRENT ROW — identical pitfall in both engines, handled the
    same way)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@spark_query(
    "q_window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 4)    AS cume,
       NTILE(10) OVER w                AS decile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking per segment: percent_rank, cume_dist, and
    deciles over account balance (unique sort via the key tiebreak)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@spark_query(
    "q_skyline_pareto",
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         CAST(ROUND(MIN(l_extendedprice), 2) AS DOUBLE) AS best_price,
         CAST(ROUND(AVG(l_quantity), 4) AS DOUBLE) + 0.0 AS avg_qty
  FROM lineitem GROUP BY l_partkey
),
grp AS (
  SELECT best_price, MAX(avg_qty) AS gq FROM per_part GROUP BY best_price
),
sweep AS (
  SELECT best_price, gq,
         MAX(gq) OVER (ORDER BY best_price
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
  FROM grp
)
SELECT p.l_partkey, p.best_price, p.avg_qty
FROM per_part p JOIN sweep s ON p.best_price = s.best_price
WHERE NOT (COALESCE(s.m1, -1) >= p.avg_qty OR s.gq > p.avg_qty)
ORDER BY p.best_price, p.l_partkey
""",
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) preference query: parts not dominated
    on (cheapest observed price ASC, average order quantity DESC) — a
    part survives iff no other part is at most as expensive AND moves
    at least as much volume, with one strict inequality.  (Average
    quantity, not max: TPC-H quantity caps at 50, which would collapse
    the frontier to one point.)

    Plan: the naive formulation is a quadratic NOT EXISTS self-join;
    the 2-D skyline instead falls out of one SORT SWEEP — per-price
    group maxima, a running max over strictly-cheaper groups (ROWS
    frame over the grouped table, which sidesteps range-frame
    semantics on float keys), then a per-part dominance test.  All
    shuffles are by price group.

    Scale: skyline is DISTRIBUTIVE — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so at 100 TB each partition
    sweeps locally and only local survivors (typically a sliver) reach
    the final sweep; the group-sweep here is that final pass.  The
    oracle runs the identical sweep, so the hash match pins the
    dominance semantics including price ties."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.min("l_extendedprice"), 2).cast("double").alias("best_price"),
        (F.round(F.avg("l_quantity"), 4).cast("double") + F.lit(0.0)).alias(
            "avg_qty"
        ),
    )
    grp = per_part.groupBy("best_price").agg(F.max("avg_qty").alias("gq"))
    w = Window.orderBy("best_price").rowsBetween(Window.unboundedPreceding, -1)
    sweep = grp.withColumn("m1", F.max("gq").over(w))
    dominated = (F.coalesce(F.col("m1"), F.lit(-1.0)) >= F.col("avg_qty")) | (
        F.col("gq") > F.col("avg_qty")
    )
    return (
        per_part.join(sweep, "best_price")
        .filter(~dominated)
        .select("l_partkey", "best_price", "avg_qty")
        .orderBy("best_price", "l_partkey")
    )


@spark_query(
    "q_global_sort_range",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderstatus = 'O'
ORDER BY total_cents DESC, o_orderkey
""",
)
def q_global_sort_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-ordered full result (the export shape: write a
    totally-ordered dataset, e.g. for sorted-run downstream
    consumers).  ``orderBy`` without a LIMIT compiles to a
    RANGE-partitioned exchange (sampled split points) + per-partition
    sort — the scalable total order; the anti-pattern is
    row_number-over-empty-window or coalesce(1), which serialize the
    world into one task.  test_plans asserts the rangepartitioning
    exchange.  Sort keys are exact integer cents so split-point
    comparisons and the tie-break are engine-identical.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
    )


@spark_query(
    "q_window_time_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def q_window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the rolling 1-hour event
    count and cents sum ending at each event — the sliding-window
    feature every fraud/alerting pipeline computes (contrast
    q_window_range_frame, whose RANGE frame is numeric).

    The IDENTICAL SQL text runs on Spark and DuckDB (both implement
    SQL-standard RANGE + INTERVAL frames over a timestamp ORDER BY),
    so the frame-boundary semantics — inclusive [ts-1h, ts], peers
    share frames — are hash-verified.  One window shuffle on
    user_id; the frame is evaluated by a sliding aggregator over the
    per-user sort, not a self-join.
    """
    from ..sources.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
                 AS cents_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@spark_query(
    "q_stable_row_ids",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS stable_id
FROM orders
""",
)
def q_stable_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous stable ids 0..n-1 in key order WITHOUT the global
    single-partition sort — the id-assignment every training-data
    export needs (example ids, shard offsets), and the classic
    anti-pattern trap: ``row_number() OVER (ORDER BY key)`` collapses
    the world into ONE task.

    Two-phase plan instead: (1) range-bucket rows by key against a
    broadcast 1-row max aggregate (32 fixed-width buckets); (2) the
    bucket COUNT table (32 rows) gets exclusive-prefix offsets via a
    window over itself; (3) each row's id = its bucket offset + its
    row_number WITHIN the bucket — per-bucket windows run in
    parallel, so no stage ever holds more than one bucket's rows.
    The oracle states the global-window semantics; results are
    identical.  At 100 TB the bucket count rises with data and the
    split points come from a range sampler (as orderBy already does),
    but the offset table stays bucket-cardinality-bounded — the
    pattern is exactly zipWithIndex done in DataFrame algebra."""
    B = 32
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    mx = o.agg(F.max("o_orderkey").alias("mx"))
    bucketed = o.crossJoin(bcast(mx, "1-row max aggregate")).select(
        "o_orderkey",
        F.least(
            F.lit(B - 1), F.floor(F.col("o_orderkey") * B / (F.col("mx") + 1))
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # 32-row offset table: inclusive prefix sum minus own count =
    # exclusive offset.  The single-partition window is over 32 rows,
    # never over data.
    offsets = counts.select(
        "bucket",
        (F.sum("n").over(Window.orderBy("bucket")) - F.col("n")).alias("offset"),
    )
    w_in = Window.partitionBy("bucket").orderBy("o_orderkey")
    return (
        bucketed.join(bcast(offsets, "literal offset dim (9 rows)"), "bucket")
        .select(
            "o_orderkey",
            (F.row_number().over(w_in) - 1 + F.col("offset")).alias("stable_id"),
        )
    )
