"""Property tests for the round-11 batch (Kaplan–Meier, Markov
removal-effect attribution, rolling median): independent lifelines-free
numpy re-derivations plus the structural laws of each estimator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.operators.robust import _daily
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def _subjects(spark, sf_dir):
    """(grp, duration_days, event_flag) per user, mirroring the query's
    value>95 high-value-purchase definition."""
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("t0"),
            F.max(F.unix_micros("ts")).alias("tl"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 95.0),
                    F.unix_micros("ts"),
                )
            ).alias("tc"),
        )
        .collect()
    )
    out = []
    for r in rows:
        conv = r["tc"] is not None
        end = r["tc"] if conv else r["tl"]
        out.append(
            (r["user_id"] % 2, int((end - r["t0"]) // 86_400_000_000), int(conv))
        )
    return out


def test_kaplan_meier_matches_numpy(spark, sf_dir):
    """Re-derive S(t), n_risk, d, c per group from raw subjects with
    the product-limit formula."""
    rows = QUERIES["q_kaplan_meier"](spark, sf_dir).collect()
    assert rows
    subj = _subjects(spark, sf_dir)
    for grp in {r["grp"] for r in rows}:
        g = [(t, ev) for (gg, t, ev) in subj if gg == grp]
        times = sorted({t for t, ev in g if ev})
        n_at_risk = len(g)
        surv = 1.0
        expect = {}
        for t in sorted({t for t, _ in g}):
            d = sum(1 for tt, ev in g if tt == t and ev)
            c = sum(1 for tt, ev in g if tt == t and not ev)
            if d > 0:
                surv *= 1.0 - d / n_at_risk
                expect[t] = (n_at_risk, d, c, surv)
            n_at_risk -= d + c
        got = {r["day"]: r for r in rows if r["grp"] == grp}
        assert set(got) == set(expect)
        for t, (n_risk, d, c, s) in expect.items():
            r = got[t]
            assert r["n_risk"] == n_risk
            assert r["n_events"] == d
            assert r["n_censored"] == c
            assert abs(r["survival"] - round(s, 4)) < 1e-9
        del times


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    """S(t) is non-increasing in t within each group and in (0, 1]."""
    rows = QUERIES["q_kaplan_meier"](spark, sf_dir).collect()
    by_grp: dict[int, list] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append((r["day"], r["survival"]))
    for pts in by_grp.values():
        pts.sort()
        ss = [s for _, s in pts]
        assert all(0.0 <= s <= 1.0 for s in ss)
        assert all(a >= b - 1e-9 for a, b in zip(ss, ss[1:]))


def test_markov_attribution_laws(spark, sf_dir):
    """Purchase removal must zero conversions (removal_effect = 1);
    every removal effect lies in [0, 1]; conv_base is shared across
    rows and exceeds every conv_removed."""
    rows = QUERIES["q_markov_attribution"](spark, sf_dir).collect()
    assert len(rows) == 5
    base = {r["conv_base"] for r in rows}
    assert len(base) == 1
    b = base.pop()
    assert 0.0 < b <= 1.0
    for r in rows:
        assert 0.0 <= r["removal_effect"] <= 1.0
        assert r["conv_removed"] <= b + 1e-9
        if r["channel"] == "purchase":
            assert r["conv_removed"] == 0.0
            assert r["removal_effect"] == 1.0


def test_rolling_median_matches_numpy(spark, sf_dir):
    """Each trailing-7 frame's exact interpolated median and mean."""
    rows = QUERIES["q_rolling_median"](spark, sf_dir).collect()
    assert rows
    daily = _daily(spark, sf_dir).collect()
    series: dict[str, list[tuple[int, float]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["y"]))
    for s in series.values():
        s.sort()
    for r in rows:
        pts = series[r["event_type"]]
        i = next(k for k, (d, _) in enumerate(pts) if d == r["d"])
        frame = [y for _, y in pts[max(0, i - 6) : i + 1]]
        assert r["n_window"] == len(frame)
        assert abs(round(float(np.median(frame)), 4) - r["roll_median"]) < 1e-9
        assert abs(round(float(np.mean(frame)), 4) - r["roll_mean"]) < 1e-9
