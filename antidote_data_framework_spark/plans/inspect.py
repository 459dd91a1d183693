"""Physical-plan inspection — the engine's performance guardrails.

Correctness tests can't see a plan regression (a filter that stopped
pushing down still returns the right rows — it just reads 100 TB to do
it).  These helpers turn `.explain()` output into assertable facts;
tests/test_plans.py pins the properties every scale-sensitive operator
must keep.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown)."""
    out: list[str] = []
    # plan text elides long filter lists ("...") before the closing
    # bracket — stop at whichever comes first
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", physical_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def broadcast_join_count(df: DataFrame) -> int:
    """How many joins chose the broadcast-hash strategy."""
    return physical_plan(df).count("BroadcastHashJoin")


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan pre-aggregates map-side before the shuffle."""
    plan = physical_plan(df)
    return "HashAggregate" in plan and "partial" in plan.lower()


def uses_python_eval(df: DataFrame) -> bool:
    """True when the plan crosses into Python (BatchEvalPython /
    ArrowEvalPython / mapInPandas...) — banned on hash-matched paths."""
    plan = physical_plan(df)
    return "EvalPython" in plan or "PythonMapInArrow" in plan or "MapInPandas" in plan
