"""Aggregation operators — SURVEY.md §2B O-13..O-19.

All expressed as declarative groupBy/agg plans: Catalyst plans a
partial (map-side) HashAggregate + final HashAggregate after the
shuffle automatically, so at 100 TB each executor pre-combines its
partitions before any exchange.  Group keys here (returnflag,
linestatus, brand, ...) are low-cardinality, so the shuffled state is
tiny regardless of input size.

Determinism: every DOUBLE aggregate is rounded in BOTH engines (see
SURVEY.md §2 determinism rules) — sums of large magnitude to 2
decimals, averages/variances to 4 — so FP summation-order differences
between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
       ROUND(AVG(l_discount), 4)                                          AS avg_disc,
       COUNT(*)                                                           AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): pricing summary per returnflag/linestatus.

    Scale notes: 2-key groupBy over the fact table -> partial agg on
    every scan partition, ~6 groups shuffled.  The scan reads only the
    7 referenced columns (column pruning; verify via explain()).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
