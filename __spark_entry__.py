"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``antidote_data_framework_spark``: the engine's registry
holds one entry per implemented operator from SURVEY.md §2, plus the
matching DuckDB oracle SQL for every SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import antidote_data_framework_spark as engine  # noqa: E402
import antidote_data_framework_spark.operators  # noqa: E402,F401  (registers queries)
import antidote_data_framework_spark.ml  # noqa: E402,F401  (registers recsys/ML queries)
import antidote_data_framework_spark.streaming  # noqa: E402,F401  (registers streaming queries)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape pricing summary) on sf0.001."""
    return engine.QUERIES["q_agg_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(engine.ORACLE_SQL)
