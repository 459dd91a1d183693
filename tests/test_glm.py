"""Golden test for the rows-only IRLS logistic regression: replay the
IDENTICAL full-batch IRLS in numpy from the raw feature rows; the
distributed moments must produce the same coefficients."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as entrymod
from antidote_data_framework_spark.ml.glm import IRLS_ITERS, _features

QUERIES = entrymod.queries()


def _numpy_irls(X, y, iters):
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 1e-10, 1.0 - 1e-10)
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w
        A = X.T @ (X * w[:, None])
        b = X.T @ (w * z)
        beta = np.linalg.solve(A, b)
    return beta


def test_irls_matches_numpy_replay(spark, sf_dir):
    rows = _features(spark, sf_dir).collect()
    X = np.array([[1.0, r["x1"], r["x2"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    beta = _numpy_irls(X, y, IRLS_ITERS)

    out = QUERIES["q_glm_logreg_irls"](spark, sf_dir).collect()[0]
    got = np.array([out["beta0"], out["beta1_value"], out["beta2_hour"]])
    assert np.allclose(got, beta, atol=1e-5), (got, beta)
    assert out["n_rows"] == len(rows)
    assert 0.0 < out["base_rate"] < 1.0
    assert out["log_likelihood"] < 0
    # a fitted model must beat or match majority-class accuracy
    majority = max(out["base_rate"], 1 - out["base_rate"])
    assert out["accuracy_at_half"] >= majority - 1e-9


def test_irls_loglik_beats_null_model(spark, sf_dir):
    out = QUERIES["q_glm_logreg_irls"](spark, sf_dir).collect()[0]
    p = out["base_rate"]
    n = out["n_rows"]
    null_ll = n * (p * np.log(p) + (1 - p) * np.log(1 - p))
    assert out["log_likelihood"] >= null_ll - 1e-6
