"""Scale-curve proxy totality (r10 VERDICT #5): every registered query
is either ON the measured curve (SCALE_CHECKPOINT.json), a tier-7
representative, or names a measured sibling whose plan shape it shares
— no query's 100-TB growth claim is left implicit."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from antidote_data_framework_spark.scale_proxies import SCALE_PROXIES, TIER7_QUERIES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _measured() -> set[str]:
    with open(os.path.join(HERE, "SCALE_CHECKPOINT.json")) as fh:
        return set(json.load(fh)["queries"])


def test_every_query_measured_or_proxied():
    keys = set(entrymod.queries())
    covered = _measured() | set(SCALE_PROXIES) | set(TIER7_QUERIES)
    missing = sorted(keys - covered)
    assert not missing, f"queries with no curve point and no proxy: {missing}"


def test_proxy_targets_are_measured():
    on_curve = _measured() | set(TIER7_QUERIES)
    bad = sorted(
        (k, v) for k, v in SCALE_PROXIES.items() if v not in on_curve
    )
    assert not bad, f"proxy targets not on the measured curve: {bad}"


def test_no_proxy_chains_or_self_loops():
    # A proxy target must be a terminal curve point, never itself proxied.
    chained = sorted(v for v in SCALE_PROXIES.values() if v in SCALE_PROXIES)
    assert not chained, f"proxy chains: {chained}"
    assert all(k != v for k, v in SCALE_PROXIES.items())


def test_proxies_name_registered_queries():
    keys = set(entrymod.queries())
    unknown = sorted(
        set(SCALE_PROXIES) | set(SCALE_PROXIES.values()) | set(TIER7_QUERIES)
    )
    unknown = [k for k in unknown if k not in keys]
    assert not unknown, f"proxy registry names unregistered queries: {unknown}"


def test_measured_keys_not_double_booked():
    # A measured query must not ALSO carry a proxy annotation.
    dup = sorted(_measured() & set(SCALE_PROXIES))
    assert not dup, f"measured queries with redundant proxies: {dup}"
