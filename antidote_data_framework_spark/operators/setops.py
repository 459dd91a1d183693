"""Set operators — SURVEY.md §2B O-26/O-27.

UNION/INTERSECT/EXCEPT over customer keysets.  Spark's ``intersect``/
``subtract`` have SQL DISTINCT semantics (Catalyst plans them as
aggregates/joins); ``unionAll`` is bag UNION ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


def _status_custkeys(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
        .distinct()
    )


@spark_query(
    "q_set_union",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT (SELECT COUNT(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS n_union_all,
       (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))     AS n_union_distinct
""",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL vs UNION DISTINCT cardinality of 'O'- and 'F'-status
    customer keysets in one row."""
    a = _status_custkeys(spark, sf_dir, "O")
    b = _status_custkeys(spark, sf_dir, "F")
    n_all = a.unionAll(b).agg(F.count(F.lit(1)).alias("n_union_all"))
    n_dist = a.unionAll(b).distinct().agg(F.count(F.lit(1)).alias("n_union_distinct"))
    return n_all.crossJoin(n_dist)


@spark_query(
    "q_set_intersect_except",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'intersect' AS which, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'except' AS which, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
""",
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (DISTINCT semantics) of the same keysets,
    tagged into one result."""
    a = _status_custkeys(spark, sf_dir, "O")
    b = _status_custkeys(spark, sf_dir, "F")
    inter = a.intersect(b).select(F.lit("intersect").alias("which"), "o_custkey")
    exc = a.subtract(b).select(F.lit("except").alias("which"), "o_custkey")
    return inter.unionAll(exc)


@spark_query(
    "q_set_bag_ops",
    oracle="""
WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
     b AS (SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')
SELECT 'intersect_all' AS which, l_partkey, COUNT(*) AS n
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
UNION ALL
SELECT 'except_all' AS which, l_partkey, COUNT(*) AS n
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
""",
)
def q_set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): duplicate
    multiplicities are preserved (min / difference of counts), unlike
    the DISTINCT variants of q_set_intersect_except.  Spark plans both
    with a count-comparing aggregate + generate — no row explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    inter = (
        a.intersectAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("which"), "l_partkey", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("which"), "l_partkey", "n")
    )
    return inter.unionAll(exc)


@spark_query(
    "q_bitmap_membership",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders
FROM customer c
GROUP BY c.c_mktsegment
""",
)
def q_bitmap_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index membership: "which customers have orders" answered
    through a COMPRESSED BITMAP instead of a semi-join — the ordering
    customer keys pack into 64-bit blocks (block = key DIV 64, bit =
    key MOD 64, bit_or-aggregated), and membership is one shift-AND
    against the probe row's block.  The oracle states the EXISTS
    semantics, so the hash-match proves the bitmap path computes
    exactly the semi-join — a cross-PARADIGM equivalence, not a
    mechanical restatement.

    Why it matters at 100 TB: the bitmap of a billion-key set is
    ~16 M blocks x 16 bytes — a broadcastable structure 64x denser
    than the distinct-key list a semi-join shuffles, and bitmap
    AND/OR composes filters without touching the fact table again
    (the roaring-bitmap idea in plain SQL).  Shape: one groupBy on
    block builds the index (partial bit_or is map-side), the probe is
    an equi-join on block + a codegen shift — no row explosion
    anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bitmap = (
        orders.select(
            (F.col("o_custkey") / 64).cast("long").alias("block"),
            (F.col("o_custkey") % 64).cast("int").alias("bit"),
        )
        .groupBy("block")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask"))
    )
    probed = (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_custkey") / 64).cast("long").alias("block"),
            (F.col("c_custkey") % 64).cast("int").alias("bit"),
        )
        .join(bitmap, "block", "left")
        .select(
            "c_mktsegment",
            (
                F.coalesce(
                    F.expr("shiftright(mask, bit) & CAST(1 AS BIGINT)"), F.lit(0)
                )
                == 1
            ).alias("member"),
        )
    )
    return probed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_orders"),
    )
