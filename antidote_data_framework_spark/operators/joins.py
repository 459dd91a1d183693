"""Join operators — SURVEY.md §2B O-4..O-12.

Physical-strategy posture for 100 TB:

- fact⋈fact equi joins (lineitem⋈orders) shuffle on the join key —
  both sides hash-partitioned; AQE splits skewed keys at runtime.
- dim joins (nation, region, customer at small SF; part/supplier
  dims generally) are broadcast — ``F.broadcast`` where the dimension
  is guaranteed small, otherwise ``autoBroadcastJoinThreshold`` +
  AQE decide from runtime stats.
- the as-of join (no native Spark primitive) is a ranged equi-join +
  per-key window dedup: the equi part (user key) shuffles once, the
  window dedup rides the same partitioning, so no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import spark_query
from ..functions.money import sum_discounted_price
from ..sources import load_table


@spark_query(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer — Catalyst picks the physical
    strategy (broadcast at this SF; sort-merge/shuffle-hash at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@spark_query(
    "q_join_broadcast",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi join nation⋈region: the 5-row dim ships to every
    executor; zero shuffle regardless of the big side's size."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@spark_query(
    "q_join_5way_star",
    oracle="""
SELECT n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_join_5way_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way star join, revenue per ASIA nation.

    Scale plan: lineitem⋈orders is the only fact-fact shuffle; nation/
    region broadcast by structural smallness (25/5 rows).  customer is
    SF-proportional so it carries NO hint — stats/AQE broadcast it
    while it fits and shuffle it at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            sum_discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@spark_query(
    "q_join_outer",
    oracle="""
SELECT 'left' AS join_kind, c.c_custkey, o.o_orderkey
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'full' AS join_kind, c.c_custkey, o.o_orderkey
FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left and full outer join customer⟕/⟗orders in one tagged result —
    customers without orders surface with NULL o_orderkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = customer.c_custkey == orders.o_custkey
    left = (
        customer.join(orders, cond, "left")
        .select(F.lit("left").alias("join_kind"), "c_custkey", "o_orderkey")
    )
    full = (
        customer.join(orders, cond, "full")
        .select(F.lit("full").alias("join_kind"), "c_custkey", "o_orderkey")
    )
    return left.unionAll(full)


@spark_query(
    "q_join_semi",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers with at least one open order.
    Semi joins never duplicate the left side — no post-join distinct."""
    customer = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@spark_query(
    "q_join_anti",
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 46)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: parts never shipped in bulk (no lineitem with
    quantity > 46 — chosen so the result is non-empty at every SF)."""
    part = load_table(spark, sf_dir, "part")
    bulk = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 46)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@spark_query(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
WHERE r.r_regionkey <> n.n_regionkey
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join region×nation with a non-key theta filter —
    every (region, nation) pair from different regions."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .select("r_name", "n_name")
    )


@spark_query(
    "q_join_theta_range",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_late_ship,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderpriority
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+theta join: lineitems shipped more than 7 days after their
    order date.  Catalyst plans the equi part as the join key and
    applies the interval predicate as a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 7 DAYS")
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late_ship"),
            sum_discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
        )
    )


@spark_query(
    "q_join_asof",
    oracle="""
SELECT event_id, ts, last_orderkey, last_orderdate
FROM (
  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, o.o_orderkey AS last_orderkey,
         o.o_orderdate AS last_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the same user's latest order
    at-or-before the event time.

    Spark has no native as-of join; the scalable rewrite is the
    sort-merge form — UNION both sides into one per-user timeline
    (orders tagged kind=0, events kind=1), then one window pass
    ordered by (time, kind, o_orderkey) carrying the last non-null
    order via ``last(..., ignorenulls=True)`` with a running frame.
    Each event row reads the order most recently carried past it:
    exactly "latest order at-or-before ts", with kind=0 < 1 making an
    order dated exactly at the event time visible (<= semantics) and
    ascending o_orderkey making the carried row the max-key order of
    the latest date — the same tie-break the ranged form used.

    This replaced a ranged equi-join + per-event row_number top-1 in
    r9: that form fans every event out to ALL of its user's prior
    orders before the window prunes (|E| x orders-per-user join rows
    — ~15x the input here, and the 1x/3x/9x curve read 10.8x wall on
    9x data, super-linear, because the join materialization plus its
    window sort both grow with the fan-out).  The union form shuffles
    |E| + |O| rows once, sorts them per user, and carries O(1) state
    per row — n log n in the data with no fan-out term; re-measured
    sf0.1 1.6 -> 1.15 s and the 9x-data ratio 10.8x -> 1.05x (the
    single 2.25M-row shuffle is floor-dominated on 32 cores).  Events
    with no prior order drop
    (inner-join semantics, matching the oracle's JOIN).  At 100 TB
    the single user-keyed shuffle is the whole cost; a mega-user's
    timeline is one sorted partition stream, never a pairwise blow-up.
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("kind"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    e = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast(dict(orders.dtypes)["o_orderkey"]).alias("o_orderkey"),
        F.lit(None).cast(dict(orders.dtypes)["o_orderdate"]).alias("o_orderdate"),
        "event_id",
        "ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", F.asc_nulls_first("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = o.unionByName(e).select(
        "event_id",
        "ts",
        "kind",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    return (
        carried.filter((F.col("kind") == 1) & F.col("last_orderkey").isNotNull())
        .select("event_id", "ts", "last_orderkey", "last_orderdate")
    )


@spark_query(
    "q_join_asof_nearest",
    oracle="""
SELECT event_id, ts, nearest_orderkey, nearest_orderdate, delta_days
FROM (
  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
         o.o_orderkey AS nearest_orderkey,
         CAST(o.o_orderdate + INTERVAL 27 YEAR AS TIMESTAMP) AS nearest_orderdate,
         date_diff('day', CAST(o.o_orderdate + INTERVAL 27 YEAR AS DATE),
                   CAST(e.ts AS DATE)) AS delta_days,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY ABS(date_diff('day',
                        CAST(o.o_orderdate + INTERVAL 27 YEAR AS DATE),
                        CAST(e.ts AS DATE))),
                    o.o_orderdate, o.o_orderkey) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
   AND ABS(date_diff('day', CAST(o.o_orderdate + INTERVAL 27 YEAR AS DATE),
           CAST(e.ts AS DATE))) <= 90
) WHERE rn = 1
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each event matched to the same
    user's closest order in time, looking BOTH ways, within a ±90-day
    tolerance — the other as-of flavor (pandas ``merge_asof
    direction='nearest'``): sensor/event alignment where the closest
    reading matters more than the latest-preceding one (q_join_asof is
    the backward flavor).

    Fixture bridge (VERDICT r6 #1): the events table spans Jan 2024
    while orders span 1995–2001, so the raw tables share no ±90-day
    window and the join would be vacuously empty.  The order timeline
    is aligned into the event era by a fixed +27-year calendar shift
    (``add_months(o_orderdate, 324)``: 1997-01 → 2024-01), mirrored
    exactly in the oracle (``+ INTERVAL 27 YEAR``); both engines clamp
    Feb-29 to Feb-28 under year shifts, so the bridge is deterministic.
    This exercises every code path (rank, signed delta, tie-break) on
    ~50k matched events at sf0.1.

    Same scalable rewrite: ranged equi-join on the user key — the
    tolerance band is what keeps the fan-out bounded at any scale, the
    nearest-match contract is undefined without one on an unbounded
    history — then a per-event rank-1 that Catalyst compiles to
    WindowGroupLimit (partial top-1 before the exchange).  Total order:
    |Δdays| asc, then earlier order date (backward wins symmetric
    ties), then orderkey.  delta_days is emitted SIGNED (positive =
    order preceded the event) so downstream can audit the direction
    mix."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_aligned_date", F.add_months("o_orderdate", 27 * 12)
    )
    events = load_table(spark, sf_dir, "events")
    delta = F.datediff(F.to_date("ts"), F.col("o_aligned_date"))
    joined = events.join(
        orders,
        (orders.o_custkey == events.user_id)
        & (
            F.abs(F.datediff(F.to_date(events.ts), orders.o_aligned_date))
            <= F.lit(90)
        ),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.abs(delta).asc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "ts",
            F.col("o_orderkey").alias("nearest_orderkey"),
            F.col("o_aligned_date").cast("timestamp").alias("nearest_orderdate"),
            delta.cast("bigint").alias("delta_days"),
        )
    )


@spark_query(
    "q_join_range_binned",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, CAST(ts AS DATE) AS day, value
  FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id,
       COUNT(b.event_id)                 AS n_band_peers,
       CAST(ROUND(SUM(CAST(b.value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_peer_value
FROM e a
JOIN e b ON a.event_type = b.event_type AND a.day = b.day
        AND b.value BETWEEN a.value - 25.0 AND a.value + 25.0
        AND b.event_id <> a.event_id
GROUP BY a.event_id
""",
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band (range) join: for each purchase event, its same-day
    peers within ±25.0 of its value — computed via the BINNED range-join
    rewrite, not a nested-loop theta join.

    The rewrite: bucket both sides by floor(value/width) with width =
    band radius; a row's band partners can only sit in its own or the
    two adjacent buckets, so the probe side is exploded to 3 bucket
    keys and the join becomes an EQUI join on (type, day, bucket) with
    the exact BETWEEN as a residual filter.  At 100 TB the plan is a
    hash-partitioned shuffle on bounded-size buckets instead of a
    per-day cross product — the same trick behind interval joins in
    stream processors and genomics range engines.  The oracle states
    the naive theta-join semantics; results are identical."""
    width = 25.0
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "event_type",
            F.to_date("ts").alias("day"),
            "value",
            F.floor(F.col("value") / width).cast("long").alias("bucket"),
        )
    )
    probe = e.select(
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("a_type"),
        F.col("day").alias("a_day"),
        F.col("value").alias("a_value"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("probe_bucket"),
    )
    build = e.select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("value").alias("b_value"),
        F.col("bucket").alias("b_bucket"),
    )
    joined = probe.join(
        build,
        (F.col("a_type") == F.col("b_type"))
        & (F.col("a_day") == F.col("b_day"))
        & (F.col("probe_bucket") == F.col("b_bucket"))
        & (F.col("b_value") >= F.col("a_value") - width)
        & (F.col("b_value") <= F.col("a_value") + width)
        & (F.col("b_id") != F.col("a_id")),
    )
    return joined.groupBy(F.col("a_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_band_peers"),
        F.round(F.sum(F.col("b_value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("sum_peer_value"),
    )


@spark_query(
    "q_join_lateral_topk",
    oracle="""
SELECT n.n_name, t.c_custkey, t.bal_cents
FROM nation n,
LATERAL (
  SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer c WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_custkey LIMIT 2
) t
""",
)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL:1999 lateral derived table /
    CROSS APPLY): per nation, the top-2 customers by account balance
    — the IDENTICAL SQL text runs on Spark and the DuckDB oracle, so
    the engine's lateral decorrelation is hash-verified end to end.

    Catalyst DECORRELATES the lateral subquery: the per-outer-row
    ORDER BY..LIMIT becomes a rank-over-partition + filter on a
    single join — never an executed-per-row inner query (which is
    what makes LATERAL safe at 100 TB: one shuffle, not |outer|
    probes).  Balances are exact integer cents so the tie-broken
    top-2 cut is engine-identical.
    """
    from ..sources.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.bal_cents
        FROM nation n,
        LATERAL (
          SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
          FROM customer c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, c_custkey LIMIT 2
        ) t
        """
    )


@spark_query(
    "q_join_strategy_hints",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderpriority
""",
)
def q_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: the same logical join executed
    under a SHUFFLE_HASH hint — the tool for overriding Catalyst when
    statistics mislead it (e.g. a filtered build side it sizes by the
    unfiltered table).  Hash-matching the plain-join oracle proves the
    strategy hint changes ONLY the physical plan, never the result;
    test_plans asserts the ShuffledHashJoin node actually appears.

    When to reach for it at 100 TB: sort-merge (the default) spills
    sorts for both sides; shuffle-hash builds an in-memory map of the
    SMALLER side only — better when one side comfortably fits
    per-partition memory but is too big to broadcast.
    """
    from ..sources.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ SHUFFLE_HASH(c) */ o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderpriority
        """
    )


@spark_query(
    "q_map_literal_lookup",
    oracle="""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_map_literal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join elimination for tiny dimensions: the 25-row nation table
    is collected once and compiled into a literal MAP expression, so
    the "join" becomes a codegen map lookup INSIDE the fact scan
    stage — no build side, no broadcast exchange, no join node at all
    (test_plans asserts the plan is join-free).  The oracle is the
    ordinary join, so the rewrite is proven semantics-preserving.

    This is the pattern for enum-sized dimensions (status codes,
    country names) at 100 TB: a broadcast join still hashes every
    probe row against a relation; a literal map is a constant-folded
    lookup.  Bounded BY CONSTRUCTION (nation is 25 rows; guard
    refuses above 1000) — for anything bigger, broadcast joins.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = nation.collect()  # 25 rows, structurally bounded
    assert len(rows) <= 1000, "map-literal lookup is for enum-sized dims only"
    kv: list = []
    for r in rows:
        kv.extend([F.lit(r["n_nationkey"]), F.lit(r["n_name"])])
    lookup = F.create_map(*kv)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.withColumn("n_name", lookup[F.col("c_nationkey")])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
    )
