"""Temporal-join family tests (VERDICT r6 #1 and #6).

Round 6 found three operators whose only correctness evidence was an
empty-vs-empty hash-match — the fixture's events(2024) vs
orders(1995-2001) time gap meant their core logic never executed.  The
queries now bridge the gap with a fixed +27-year calendar shift; these
tests pin (a) non-vacuousness on the real fixtures and (b) the exact
tie-break / interval-edge semantics on hand-built synthetic frames
where the expected answer is computable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from antidote_data_framework_spark.ml.recsys import q_cold_start_fallback
from antidote_data_framework_spark.operators.funnels import q_scd2_asof_join
from antidote_data_framework_spark.operators.joins import (
    q_join_asof,
    q_join_asof_nearest,
)
from antidote_data_framework_spark.sources import load_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)
ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampType()),
    ]
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    """A synthetic sf_dir with hand-built events/orders exercising the
    temporal edge cases.  Order dates are written in the 1997 era so
    the queries' fixed +27y alignment lands them in Jan 2024 — the
    same bridge the real fixtures need.

    Cases (aligned date in comments):
      user 1: event e1 at 2024-01-10 00:00; orders
        k=101 1997-01-05 (→2024-01-05, Δ=+5 backward)
        k=102 1997-01-15 (→2024-01-15, Δ=-5 forward)   — symmetric tie
        k=103 1996-09-01 (→2023-09-01, Δ=131)          — outside ±90
      user 2: event e2 at 2024-01-10 00:00; orders
        k=201, k=202 BOTH 1997-01-08 (→2024-01-08)     — equal-date tie
      user 3: event e3 at 2024-01-10 00:00; order
        k=301 1996-08-01 (→2023-08-01)                 — no in-band order
      user 4 (scd2 focus): events A@2024-01-01, B@2024-01-10; orders
        k=401 1997-01-05 (→2024-01-05, inside version A)
        k=402 1997-01-10 (→2024-01-10 00:00, exactly on the A→B
              boundary: half-open tiling must yield B, once)
        k=403 1996-12-31 (→2023-12-31, before any version: no match)
    """
    d = tmp_path_factory.mktemp("synth_temporal")
    events = [
        (1, 1, _ts("2024-01-10T00:00:00"), "click"),
        (2, 2, _ts("2024-01-10T00:00:00"), "click"),
        (3, 3, _ts("2024-01-10T00:00:00"), "click"),
        (41, 4, _ts("2024-01-01T00:00:00"), "A"),
        (42, 4, _ts("2024-01-10T00:00:00"), "B"),
    ]
    orders = [
        (101, 1, _ts("1997-01-05T00:00:00")),
        (102, 1, _ts("1997-01-15T00:00:00")),
        (103, 1, _ts("1996-09-01T00:00:00")),
        (201, 2, _ts("1997-01-08T00:00:00")),
        (202, 2, _ts("1997-01-08T00:00:00")),
        (301, 3, _ts("1996-08-01T00:00:00")),
        (401, 4, _ts("1997-01-05T00:00:00")),
        (402, 4, _ts("1997-01-10T00:00:00")),
        (403, 4, _ts("1996-12-31T00:00:00")),
    ]
    spark.createDataFrame(events, EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    spark.createDataFrame(orders, ORDERS_SCHEMA).coalesce(1).write.parquet(
        str(d / "orders.parquet")
    )
    return str(d)


# ---------------------------------------------------------------- synthetic


def test_asof_nearest_symmetric_tie_backward_wins(spark, synth_dir):
    rows = {
        r["event_id"]: r
        for r in q_join_asof_nearest(spark, synth_dir).collect()
    }
    # user 1: Δ=+5 (backward, k=101) ties Δ=-5 (forward, k=102);
    # earlier o_orderdate wins → backward, signed delta positive.
    assert rows[1]["nearest_orderkey"] == 101
    assert rows[1]["delta_days"] == 5


def test_asof_nearest_equal_date_tie_lowest_orderkey(spark, synth_dir):
    rows = {
        r["event_id"]: r
        for r in q_join_asof_nearest(spark, synth_dir).collect()
    }
    assert rows[2]["nearest_orderkey"] == 201  # k asc breaks exact ties


def test_asof_nearest_tolerance_band_excludes(spark, synth_dir):
    rows = {
        r["event_id"]: r
        for r in q_join_asof_nearest(spark, synth_dir).collect()
    }
    # user 3's only order is 131 days out → no row for event 3 at all.
    assert 3 not in rows
    # user 1's out-of-band order (k=103) never beats the in-band ones.
    assert all(abs(r["delta_days"]) <= 90 for r in rows.values())


def test_asof_backward_equal_date_tie_highest_orderkey(spark, synth_dir):
    """q_join_asof (backward flavor, unshifted o_orderdate <= ts): the
    synthetic 1997 orders all precede the 2024 events, so every event
    matches its user's LATEST order; equal-date ties (user 2) break by
    o_orderkey DESC."""
    rows = {r["event_id"]: r for r in q_join_asof(spark, synth_dir).collect()}
    assert rows[2]["last_orderkey"] == 202
    assert rows[1]["last_orderkey"] == 102  # latest date, not nearest


def test_scd2_half_open_tiling_no_double_match(spark, synth_dir):
    out = [
        r
        for r in q_scd2_asof_join(spark, synth_dir).collect()
        if r["user_id"] == 4
    ]
    by_key = {}
    for r in out:
        by_key.setdefault(r["o_orderkey"], []).append(r)
    # Each order matches AT MOST one version.
    assert all(len(v) == 1 for v in by_key.values())
    # Inside version A.
    assert by_key[401][0]["state_at_order"] == "A"
    # Exactly on the A→B boundary: half-open [from, to) → B, once.
    assert by_key[402][0]["state_at_order"] == "B"
    # Before any version: no match.
    assert 403 not in by_key


# ------------------------------------------------------------ real fixtures


def test_asof_nearest_nonvacuous_on_fixtures(spark, sf_dir):
    pdf = q_join_asof_nearest(spark, sf_dir).toPandas()
    assert len(pdf) > 0, "fixture bridge failed — vacuous again"
    assert (pdf["delta_days"].abs() <= 90).all()
    # The +27y bridge should produce BOTH directions on real data.
    assert (pdf["delta_days"] > 0).any() and (pdf["delta_days"] < 0).any()


def test_scd2_nonvacuous_and_single_version(spark, sf_dir):
    pdf = q_scd2_asof_join(spark, sf_dir).toPandas()
    assert len(pdf) > 0, "fixture bridge failed — vacuous again"
    # orderkey is unique → tiling must never double-match an order.
    assert pdf["o_orderkey"].is_unique
    assert (pdf["state_since"] <= pdf["order_ts"]).all()


def test_cold_start_nonvacuous_and_consistent(spark, sf_dir):
    pdf = q_cold_start_fallback(spark, sf_dir).toPandas()
    assert len(pdf) > 0, "training-window cold cohort empty — vacuous again"
    assert set(pdf["rank"].unique()) <= {1, 2, 3}
    # Every cold user gets the full top-3 of its segment.
    per_user = pdf.groupby("c_custkey").size()
    assert (per_user == 3).all()
    # Cold really means: no order on/after the training cutoff.
    cold_keys = [int(k) for k in pdf["c_custkey"].unique()]
    orders = load_table(spark, sf_dir, "orders")
    n_in_window = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
            & F.col("o_custkey").isin(cold_keys)
        )
    ).count()
    assert n_in_window == 0
