"""Bucketed-table join — the shuffle-elimination strategy for repeated
fact⋈fact joins (SURVEY §4.2 / pyspark guide "Partitioning & shuffle").

Writing both sides bucketed by the join key co-locates matching rows
in the same bucket files; a later join reads bucket-aligned splits and
Catalyst drops the Exchange on BOTH sides.  At 100 TB this turns the
single biggest cost of a star-join pipeline (re-shuffling the fact
table for every join) into a one-time layout decision — the Spark
equivalent of a clustered index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table

N_BUCKETS = 8


@spark_query(
    "q_bucketed_join_noshuffle",
    oracle="""
SELECT o.o_orderpriority,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,2))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def q_bucketed_join_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem and orders as tables bucketed+sorted by the join
    key, then join them: the physical plan scans bucket-aligned files
    and contains NO Exchange below the join (asserted in
    tests/test_plans.py).  Output: per-orderpriority revenue — the
    same answer any layout gives; the layout only changes the plan.

    Oracle (upgraded from rows-only, r9): that layout-independence IS
    the oracle — the bucketed catalog tables must conserve the plain
    join+aggregate over the source parquet, with revenue in the exact
    decimal-money form both engines share.  The no-Exchange property
    stays plan-asserted in tests; the hash check now pins the data."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor
    from urllib.parse import urlparse

    # The two bucketed-table builds are INDEPENDENT write chains over
    # different source tables — submitted concurrently so the small
    # orders write back-fills the lineitem write's task tail (guide
    # §2.6, same pattern as q_sink_codec_tradeoff).  Catalog ops on
    # distinct table names are thread-safe; bucket layout and data are
    # deterministic per table, so the joined result is unchanged.
    def _build(spec):
        name, key, cols = spec
        table = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a prior SESSION's managed-table files survive in the warehouse
        # dir while the in-memory catalog forgets them — clear the path
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name)
            .select(*cols)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(table)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _build,
                (
                    ("lineitem", "l_orderkey",
                     ["l_orderkey", "l_extendedprice", "l_discount"]),
                    ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
                ),
            )
        )
    li = spark.table("bkt_lineitem")
    orders = spark.table("bkt_orders")
    # hint("merge") pins a sort-merge join: at tiny SF the dim would
    # broadcast and hide the point — the bucketed layout feeds SMJ
    # with pre-partitioned, pre-sorted inputs (zero Exchange, zero
    # Sort below the join).
    return (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (1 - F.col("l_discount")).cast("decimal(8,2)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# one catalog-table suffix per SparkSession (see hermeticity note below)
_CBO_SESSION_SUFFIX: dict[int, str] = {}


@spark_query(
    "q_cbo_stats_broadcast",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
""",
)
def q_cbo_stats_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based optimization via ANALYZE TABLE: a filtered dim join
    planned WITHOUT any broadcast hint — the build-side choice comes
    from catalog statistics.  After ``ANALYZE TABLE ... COMPUTE
    STATISTICS FOR COLUMNS``, Catalyst's filter-selectivity estimate
    (ndv/min/max histograms) sizes the filtered customer slice below
    autoBroadcastJoinThreshold and picks a broadcast join on its own
    (asserted in tests/test_plans.py — no hint anywhere in this
    plan).

    This is the production answer to the question every forced-hint
    op sidesteps: at 100 TB you don't hand-hint thousands of queries;
    you ANALYZE the dims on ingest and let CBO make the same call —
    correctly re-deciding when a filter is NOT selective.  The hint
    ops (q_join_broadcast, q_join_strategy_hints) remain the manual
    override for when stats mislead.

    Output: the same pricing rollup any join strategy yields — only
    the plan changes.
    """
    import shutil
    import uuid
    from urllib.parse import urlparse

    # Hermeticity (r4 ADVICE): the table name is suffixed per-SESSION,
    # so concurrent sessions sharing a warehouse can never drop each
    # other's table.  The returned plan is lazy (it reads this catalog
    # table at action time), so drop-in-finally is impossible here;
    # instead each session reuses ONE name, recreated per invocation —
    # no cross-session collision, no unbounded accumulation.
    suffix = _CBO_SESSION_SUFFIX.setdefault(id(spark), uuid.uuid4().hex[:8])
    table = f"cbo_customer_{suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    spark.sql(
        f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
        "c_custkey, c_mktsegment"
    )
    cust = spark.table(table).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
    )
