"""Property tests for the round-10 batch (item-item CF, Slope One,
Theil–Sen, AR(1), Huber mean): independent numpy re-derivations and
structural laws on top of the DuckDB hash-match the oracle already
enforces.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.ml.neighbors_cf import CAP, MIN_CO
from antidote_data_framework_spark.ml.recsys_data import ratings_df
from antidote_data_framework_spark.operators.robust import _daily

QUERIES = entrymod.queries()


def _cells(spark, sf_dir):
    return {
        (r["user_id"], r["item_id"]): r["r"]
        for r in ratings_df(spark, sf_dir)
        .groupBy("user_id", "item_id")
        .agg(F.avg("rating").alias("r"))
        .collect()
    }


def test_item_item_cosine_bounds_and_support(spark, sf_dir):
    """Cosines of nonnegative ratings lie in (0, 1]; pairs are
    upper-triangle with >= MIN_CO co-raters; the list is sorted by
    the rounded cosine descending."""
    rows = QUERIES["q_item_item_cosine"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["item_i"] < r["item_j"]
        assert r["co"] >= MIN_CO
        assert 0.0 < r["cosine"] <= 1.0
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_item_item_cosine_matches_numpy(spark, sf_dir):
    """Re-derive every reported pair's cosine from the capped rating
    cells with numpy."""
    rows = QUERIES["q_item_item_cosine"](spark, sf_dir).collect()
    cells = _cells(spark, sf_dir)
    by_user: dict[int, list[int]] = {}
    for (u, i) in sorted(cells):
        by_user.setdefault(u, []).append(i)
    capped = {
        (u, i): cells[(u, i)]
        for u, items in by_user.items()
        for i in items[:CAP]
    }
    by_item: dict[int, dict[int, float]] = {}
    for (u, i), r in capped.items():
        by_item.setdefault(i, {})[u] = r
    for row in rows:
        a, b = by_item[row["item_i"]], by_item[row["item_j"]]
        common = set(a) & set(b)
        assert len(common) == row["co"]
        dot = sum(a[u] * b[u] for u in common)
        na = np.sqrt(sum(v * v for v in a.values()))
        nb = np.sqrt(sum(v * v for v in b.values()))
        assert abs(round(dot / (na * nb), 4) - row["cosine"]) < 1e-9


def test_item_item_recommend_excludes_rated_items(spark, sf_dir):
    """No recommended item may appear in the target user's own rating
    cells, at most 3 per user, users restricted to id <= 10."""
    rows = QUERIES["q_item_item_recommend"](spark, sf_dir).collect()
    assert rows
    cells = _cells(spark, sf_dir)
    per_user: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["user_id"] <= 10
        assert (r["user_id"], r["item_id"]) not in cells
        assert r["n_contrib"] >= 1
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert all(n <= 3 for n in per_user.values())


def test_slopeone_rmse_sane_and_beats_trivial_bound(spark, sf_dir):
    """One row; 0 < mae <= rmse (Jensen); rmse below the 2.0 band a
    constant-3 predictor would roughly produce on 1..5 ratings."""
    [r] = QUERIES["q_slopeone_rmse"](spark, sf_dir).collect()
    assert r["n_pred"] > 0
    assert 0.0 < r["mae"] <= r["rmse"] + 1e-9
    assert r["rmse"] < 2.0


def test_theilsen_matches_numpy(spark, sf_dir):
    """Median-of-pairwise-slopes and median residual intercept,
    re-derived from the daily series."""
    rows = QUERIES["q_theilsen_trend"](spark, sf_dir).collect()
    daily = _daily(spark, sf_dir).collect()
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["y"]))
    for row in rows:
        pts = sorted(series[row["event_type"]])
        assert row["n_days"] == len(pts)
        slopes = [
            (yb - ya) / (db - da)
            for idx, (da, ya) in enumerate(pts)
            for (db, yb) in pts[idx + 1 :]
        ]
        slope = float(np.median(slopes))
        assert abs(round(slope, 4) - row["slope"]) < 1e-9
        intercept = float(np.median([y - slope * d for d, y in pts]))
        assert abs(round(intercept, 4) - row["intercept"]) < 1e-9


def test_ar1_matches_numpy_and_is_stationary(spark, sf_dir):
    """φ re-derived from the lag pairs; |φ| < 1 for the fixture's
    mean-reverting daily totals; forecast = μ + φ(y_last − μ)."""
    rows = QUERIES["q_ar1_forecast"](spark, sf_dir).collect()
    daily = _daily(spark, sf_dir).collect()
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["y"]))
    for row in rows:
        pts = sorted(series[row["event_type"]])
        ys = np.array([y for _, y in pts])
        mu = ys.mean()
        num = float(((ys[1:] - mu) * (ys[:-1] - mu)).sum())
        den = float(((ys[:-1] - mu) ** 2).sum())
        phi = num / den
        assert abs(round(phi, 4) - row["phi"]) < 1e-9
        assert abs(phi) < 1.0
        fc = mu + phi * (ys[-1] - mu)
        assert abs(round(float(fc), 4) - row["forecast"]) < 1e-9


def test_huber_mean_matches_numpy_and_resists_outliers(spark, sf_dir):
    """Two-pass IRLS from the median re-derived in numpy; the Huber
    estimate must sit inside [min, max] and weights never exceed 1."""
    rows = QUERIES["q_huber_mean"](spark, sf_dir).collect()
    from antidote_data_framework_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    series: dict[str, list[float]] = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append(r["value"])
    c, k = 1.345, 1.4826
    for row in rows:
        v = np.array(series[row["event_type"]])
        m0 = float(np.median(v))
        s = max(k * float(np.median(np.abs(v - m0))), 1e-9)
        m = m0
        for _ in range(2):
            w = np.minimum(1.0, c * s / np.maximum(np.abs(v - m), 1e-12))
            m = float((w * v).sum() / w.sum())
        assert abs(round(m, 4) - row["huber_mean"]) < 1e-9
        assert v.min() - 1e-9 <= row["huber_mean"] <= v.max() + 1e-9
        assert abs(round(m0, 4) - row["median_v"]) < 1e-9
