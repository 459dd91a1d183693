"""Physical-plan assertions (SURVEY §5.2.5): guard the scale
properties that correctness tests can't see — pushdown, pruning,
broadcast strategy, top-k, and the no-Python-on-hot-paths rule."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_scan_project_filter")
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    # column pruning: the scan schema must not include unused columns
    assert "l_comment" not in plan and "l_tax" not in plan


def test_small_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_5way_star")
    assert plan.count("BroadcastHashJoin") >= 3


def test_orderby_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_flagship_uses_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_agg_pricing_summary")
    assert "HashAggregate" in plan and "partial" in plan.lower()


def test_no_python_udfs_on_oracled_paths(spark, sf_dir):
    """The engine-wide rule: every hash-matched query stays JVM-side
    (BatchEvalPython / ArrowEvalPython only allowed in declared UDF /
    multimodal / streaming demos)."""
    for name in sorted(ORACLES):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} runs Python in its plan"
