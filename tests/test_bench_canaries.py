"""Pin the bench host-drift canaries (r11 VERDICT #3).

bench.py normalizes every round-over-round ratio by its class canary's
ratio before flagging a regression.  That only measures HOST drift if
the canaries' code never changes — so their function source is pinned
here by hash.  If you edit a canary's function, this test fails on
purpose: either revert, or consciously re-pin the hash AND re-base the
bench anchor in the same round (a silently edited canary would launder
a real regression in its class as 'host drift').

Also sanity-pins the classification tables: every canary and every
PANDAS_CLASS member must be a registered query, and the pandas canary
must itself classify as pandas.
"""

from __future__ import annotations

import hashlib
import inspect

from bench import CANARIES, PANDAS_CLASS, _drift_class

PINNED_SHA = {
    "q_scan_project_filter": "91512de8729825e3",
    "q_join_5way_star": "a4d7314a8c117a43",
    "q_image_phash_neardup": "520f03599eda5529",
}


def _src_sha(key: str) -> str:
    import antidote_data_framework_spark.ml  # noqa: F401 (registers)
    import antidote_data_framework_spark.operators  # noqa: F401
    from antidote_data_framework_spark.registry import QUERIES

    return hashlib.sha256(inspect.getsource(QUERIES[key]).encode()).hexdigest()[:16]


def test_canary_sources_are_frozen():
    assert set(PINNED_SHA) == set(CANARIES.values())
    for key, want in PINNED_SHA.items():
        got = _src_sha(key)
        assert got == want, (
            f"canary {key} source changed ({got} != {want}) — a canary "
            "edit invalidates drift normalization; revert or re-pin "
            "deliberately (see module docstring)"
        )


def test_canaries_and_pandas_class_are_registered():
    import __spark_entry__ as e

    qs = e.queries()
    missing = [k for k in CANARIES.values() if k not in qs]
    assert not missing, missing
    missing = sorted(k for k in PANDAS_CLASS if k not in qs)
    assert not missing, missing


def test_classification_is_consistent():
    assert _drift_class(CANARIES["pandas"]) == "pandas"
    assert _drift_class(CANARIES["scan"]) == "scan"
    assert _drift_class(CANARIES["shuffle"]) == "shuffle"
    # a plain JVM query defaults to the shuffle meter
    assert _drift_class("q_agg_pricing_summary") == "shuffle"
