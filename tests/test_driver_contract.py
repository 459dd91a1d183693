"""The driver harness passes its OWN SparkSession (no engine confs).
These tests pin the contract surface exactly as the driver drives it."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_callable_and_oracles_are_subset(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 62  # SURVEY §2 inventory size
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_survey2_keys_registered_inside_driver_window():
    """The driver verifies only the first 50 insertion-order keys
    (r01 lesson).  Pin: all 62 SURVEY §2 contract keys come first, and
    since the r9 oracle upgrades (O-2/O-3/O-51/O-52 now SQL) every one
    of the 50 window slots is hash-checked — no rows-only key may
    drift back inside the window."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert qs[:62] == entrymod.CONTRACT_ORDER[:62]
    not_oracled = [k for k in qs[:50] if k not in oracles]
    assert not_oracled == []


def test_events_queries_survive_a_conf_less_session(spark, sf_dir):
    """events.parquet is TIMESTAMP(NANOS): the loader must self-apply
    nanosAsLong + UTC on whatever session the driver provides."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        df = entrymod.queries()["q_window_tumbling"](spark, sf_dir)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
