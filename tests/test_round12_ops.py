"""Property tests for the round-12 batch (log-rank test, exact Shapley
attribution, CUPED): numpy/pure-Python re-derivations and estimator
laws on top of the DuckDB hash-match.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F, Window

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_logrank_matches_numpy(spark, sf_dir):
    """Re-derive the O−E sum, hypergeometric variance, and χ² from
    raw per-subject durations."""
    [row] = QUERIES["q_logrank_test"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    subj = (
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
    data = []
    for r in subj:
        conv = r["tc"] is not None
        end = r["tc"] if conv else r["tl"]
        data.append(
            (r["user_id"] % 2, int((end - r["t0"]) // 86_400_000_000), conv)
        )
    times = sorted({t for _, t, ev_ in data if ev_})
    o_minus_e = var = 0.0
    n_times = 0
    for t in times:
        n_all = sum(1 for _, tt, _ in data if tt >= t)
        n1 = sum(1 for g, tt, _ in data if tt >= t and g == 1)
        d_all = sum(1 for _, tt, ev_ in data if tt == t and ev_)
        d1 = sum(1 for g, tt, ev_ in data if tt == t and ev_ and g == 1)
        if n_all == 0:
            continue
        n_times += 1
        p1 = n1 / n_all
        o_minus_e += d1 - d_all * p1
        if n_all > 1:
            var += d_all * p1 * (1 - p1) * (n_all - d_all) / (n_all - 1)
    assert row["n_times"] == n_times
    assert abs(round(o_minus_e, 4) - row["observed_minus_expected"]) < 1e-9
    assert abs(round(var, 4) - row["variance"]) < 1e-9
    chi2 = o_minus_e * o_minus_e / var
    assert abs(round(chi2, 4) - row["chi2"]) < 1e-9
    assert row["significant_95"] == (1 if chi2 > 3.841 else 0)


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Σ φ(ch) = v(grand coalition) − v(∅) (the efficiency axiom of
    the exact Shapley value), re-deriving both sides from the per-user
    touch masks."""
    rows = QUERIES["q_shapley_attribution"](spark, sf_dir).collect()
    assert len(rows) == 4
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev2 = ev.select("user_id", "event_type", F.row_number().over(wseq).alias("seq"))
    fp = (
        ev2.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("seq").alias("pseq"))
    )
    touch = (
        ev2.join(fp, "user_id", "left")
        .filter(F.col("pseq").isNull() | (F.col("seq") < F.col("pseq")))
        .groupBy("user_id")
        .agg(
            F.collect_set("event_type").alias("chs"),
            F.max(F.when(F.col("pseq").isNotNull(), 1).otherwise(0)).alias("conv"),
        )
        .collect()
    )
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    agg: dict[int, list[int]] = {}
    for r in touch:
        mask = sum(bits[c] for c in r["chs"] if c in bits)
        agg.setdefault(mask, []).append(r["conv"])
    v = {m: sum(cs) / len(cs) for m, cs in agg.items()}
    total = sum(r["shapley_value"] for r in rows)
    expect = v.get(15, 0.0) - v.get(0, 0.0)
    # each φ is rounded to 4dp, so the sum is within 4*0.5e-4
    assert abs(total - expect) < 4 * 0.5e-4 + 1e-9


def test_cuped_reduces_variance_and_theta_is_ols_slope(spark, sf_dir):
    """var_cuped ≤ var_raw always (θ is the variance-minimizing
    coefficient); reduction equals the squared correlation between
    pre and post, re-derived with numpy."""
    [row] = QUERIES["q_cuped_adjustment"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    first = min(r["us"] for r in ev)
    cut = first + 15 * 86_400_000_000
    pp: dict[int, list[float]] = {}
    for r in ev:
        pre, post = pp.setdefault(r["user_id"], [0.0, 0.0])
        if r["us"] < cut:
            pp[r["user_id"]][0] = pre + r["value"]
        else:
            pp[r["user_id"]][1] = post + r["value"]
    pre = np.array([a for a, _ in pp.values()])
    post = np.array([b for _, b in pp.values()])
    theta = float(np.cov(pre, post, bias=True)[0, 1] / pre.var())
    adj = post - theta * (pre - pre.mean())
    assert row["n_users"] == len(pp)
    assert abs(round(theta, 4) - row["theta"]) < 1e-9
    assert abs(round(float(post.var()), 4) - row["var_raw"]) < 1e-9
    assert abs(round(float(adj.var()), 4) - row["var_cuped"]) < 1e-9
    assert row["var_cuped"] <= row["var_raw"] + 1e-9
    r2 = float(np.corrcoef(pre, post)[0, 1] ** 2)
    assert abs(row["var_reduction"] - r2) < 1e-3


def test_logrank_risk_set_shrinks_on_censor_only_days(spark, tmp_path):
    """r5 ADVICE regression: subjects censored on a day with NO deaths
    must still leave the risk set before later death days.  Synthetic
    cohort: user 0 (grp 0) dies day 0; user 2 (grp 0) is censored day
    1 (death-free); users 1,3 (grp 1) and 4 (grp 0) die day 2.  At
    day 2 the correct risk set is {1, 3, 4} (n_all=3, n1=2) — the
    pre-fix code kept user 2 at risk (n_all=4) because day 1 never
    entered the cumulative-exit grid."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, day_off, etype, value):
        return (eid, t0 + dt.timedelta(days=day_off), uid, etype, value, "{}")

    rows = [
        # every user starts with a view at day 0 (sets t0)
        ev(1, 0, 0, "view", 0.0),
        ev(2, 1, 0, "view", 0.0),
        ev(3, 2, 0, "view", 0.0),
        ev(4, 3, 0, "view", 0.0),
        ev(5, 4, 0, "view", 0.0),
        # user 0 converts day 0 (death at t=0)
        ev(6, 0, 0, "purchase", 100.0),
        # user 2: last event day 1, never converts (censored t=1, death-free day)
        ev(7, 2, 1, "view", 0.0),
        # users 1, 3, 4 convert day 2
        ev(8, 1, 2, "purchase", 100.0),
        ev(9, 3, 2, "purchase", 100.0),
        ev(10, 4, 2, "purchase", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    [row] = QUERIES["q_logrank_test"](spark, str(tmp_path)).collect()

    # hand-computed: death days {0, 2}
    # t=0: n_all=5 (all), n1=2, d_all=1 (user 0, grp 0), d1=0
    #   o_minus_e += 0 - 1*(2/5) = -0.4
    #   var += 1*(2/5)*(3/5)*(5-1)/(5-1) = 0.24
    # t=2: risk set {1,3,4} -> n_all=3, n1=2, d_all=3, d1=2
    #   o_minus_e += 2 - 3*(2/3) = 0.0
    #   var += 3*(2/3)*(1/3)*(3-3)/(3-1) = 0.0
    assert row["n_times"] == 2
    assert abs(row["observed_minus_expected"] - (-0.4)) < 1e-9
    assert abs(row["variance"] - 0.24) < 1e-9
    assert abs(row["chi2"] - round(0.16 / 0.24, 4)) < 1e-6
