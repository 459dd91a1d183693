"""Property tests for the round-4 continuation operators (patterns,
negatives, linreg, vocab): each asserts a law the differential oracle
can't express — cross-checks against numpy, set-level invariants, and
output-domain bounds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.ml.recsys_data import ratings_df

QUERIES = entrymod.queries()


def test_negative_sampling_never_collides_with_positives(spark, sf_dir):
    """The defining property: no emitted negative is an observed
    positive, and the expansion is bounded by K=3 per positive."""
    neg = QUERIES["q_negative_sampling"](spark, sf_dir)
    pos = ratings_df(spark, sf_dir).select("user_id", "item_id").distinct()
    collisions = neg.join(
        pos,
        (neg.user_id == pos.user_id) & (neg.neg_item == pos.item_id),
        "inner",
    ).count()
    assert collisions == 0
    n_neg, n_pos = neg.count(), pos.count()
    assert 0 < n_neg <= 3 * n_pos


def test_grouped_linreg_matches_numpy_polyfit(spark, sf_dir):
    """The closed-form moment-sum OLS must equal numpy's least-squares
    fit on the same (x, y) points for a spot-checked group."""
    rows = QUERIES["q_grouped_linreg"](spark, sf_dir).collect()
    assert len(rows) == 25
    brand = rows[0]["p_brand"]
    from antidote_data_framework_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") == brand)
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        )
        .collect()
    )
    x = np.array([r["x"] for r in pts], dtype=float)
    y = np.array([r["y"] for r in pts], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    got = next(r for r in rows if r["p_brand"] == brand)
    assert abs(got["slope_cents"] - slope) < 1e-2 * max(1.0, abs(slope))
    assert abs(got["intercept_cents"] - intercept) < 1e-2 * max(1.0, abs(intercept))


def test_vocab_coverage_bounds(spark, sf_dir):
    """OOV rate is a proper fraction and n_oov never exceeds n_tokens;
    with a 1000-term vocabulary over the small fixture vocabulary the
    rate must be strictly below 1."""
    rows = QUERIES["q_vocab_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] < 1.0


def test_mad_outliers_flags_fewer_than_quarter(spark, sf_dir):
    """The guaranteed law is only that <=50% of rows exceed 1*MAD
    (MAD is the median of deviations) — so 0.5 is the structural
    bound for the 3*MAD gate.  The tighter 0.25 check below is a
    fixture-specific regression value (r4 ADVICE: don't present it
    as a law); it holds comfortably on the seed-42 events
    distribution and would only move if the fixture generator does."""
    rows = QUERIES["q_mad_outliers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_outliers"] <= r["n_events"] * 0.5  # structural law
        assert r["n_outliers"] <= r["n_events"] * 0.25  # fixture regression value
        assert r["mad_cents"] > 0


def test_feature_store_pit_has_no_future_leakage(spark, sf_dir):
    """Re-derive the strictly-prior click counts independently with a
    range join and compare — the window-frame implementation must
    never count an event at or after the label timestamp."""
    from antidote_data_framework_spark.sources import load_table

    out = QUERIES["q_feature_store_pit"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    recheck = (
        out.join(
            clicks,
            (out.user_id == F.col("u")) & (F.col("cts") < out.label_ts),
            "left",
        )
        .groupBy("user_id", "label_ts", "n_prior_clicks")
        .agg(F.count("cts").alias("n_recheck"))
    )
    bad = recheck.filter(F.col("n_prior_clicks") != F.col("n_recheck")).count()
    assert bad == 0
