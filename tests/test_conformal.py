"""Property tests for split-conformal intervals (ml/conformal.py):
the distribution-free coverage guarantee and an exact numpy replay of
the grid-quantile order statistic."""

from __future__ import annotations

import math

import numpy as np

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_conformal_coverage_meets_target(spark, sf_dir):
    """Split-conformal law: with q_hat = the ceil((n_cal+1)*0.9)-th
    smallest calibration score, eval coverage concentrates at >= 0.9.
    The guarantee is marginal over exchangeable splits; for this fixed
    hash split we allow binomial slack of 3 standard errors below the
    target, which the law makes essentially impossible to violate."""
    row = QUERIES["q_conformal_interval"](spark, sf_dir).collect()[0]
    assert row["n_cal"] > 100
    assert row["n_eval"] > 100
    slack = 3.0 * math.sqrt(0.9 * 0.1 / row["n_eval"])
    assert row["coverage"] >= 0.9 - slack
    assert row["target_coverage"] == 0.9
    assert 0.0 <= row["q_hat"] <= 4.0  # residuals of clamped 1..5 ratings


def test_conformal_qhat_matches_numpy_order_statistic(spark, sf_dir):
    """q_hat must be EXACTLY the ceil((n+1)*0.9)-th smallest calibration
    score on the 1e-4 grid — replay the rank with numpy on the same
    holdout scores rebuilt from the registered prediction pipeline."""
    from pyspark.sql import functions as F

    from antidote_data_framework_spark.ml.recsys_data import (
        bias_components,
        is_train,
        ratings_df,
    )

    r = ratings_df(spark, sf_dir)
    cells = r.groupBy("user_id", "item_id").agg(F.avg("rating").alias("rating"))
    mu, bu, bi = bias_components(spark, sf_dir)
    pred = (
        cells.crossJoin(F.broadcast(mu))
        .join(bu, "user_id", "left")
        .join(bi, "item_id", "left")
        .select(
            "user_id",
            "item_id",
            "rating",
            F.least(
                F.lit(5.0),
                F.greatest(
                    F.lit(1.0),
                    F.col("mu")
                    + F.coalesce("bu", F.lit(0.0))
                    + F.coalesce("bi", F.lit(0.0)),
                ),
            ).alias("pred"),
        )
    )
    hold = (
        pred.filter(~is_train(F.col("user_id"), F.col("item_id")))
        .select(
            F.round(F.abs(F.col("rating") - F.col("pred")), 4).alias("score"),
            ((F.col("user_id") * 17 + F.col("item_id") * 3) % 2 == 0).alias(
                "is_cal"
            ),
        )
        .collect()
    )
    cal = np.sort(np.array([h["score"] for h in hold if h["is_cal"]]))
    n = len(cal)
    k = math.floor((9 * (n + 1) + 9) / 10.0)  # == ceil((n+1)*0.9)
    assert k == math.ceil((n + 1) * 0.9)
    expected_q = float(cal[min(k, n) - 1])
    got = QUERIES["q_conformal_interval"](spark, sf_dir).collect()[0]
    assert abs(got["q_hat"] - round(expected_q, 4)) < 1e-9
    assert got["n_cal"] == n
