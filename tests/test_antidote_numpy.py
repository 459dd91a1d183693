"""Golden tests for the antidote numpy core (SURVEY.md §5.2):
the closed-form gradient is checked against finite differences, and
the projected step against the paper's Algorithm-1 invariants."""

from __future__ import annotations

import numpy as np

from antidote_data_framework_spark.ml.antidote import (
    RATING_HI,
    RATING_LO,
    _det_factors,
    _det_init,
    antidote_step,
    polarization_grad,
    polarization_np,
    predict_antidote,
    ridge_hat_factor,
)

K, M, RANK, LAM = 4, 12, 3, 0.1


def _fixture():
    X = _det_init(K, M)
    V = _det_factors(M, RANK)
    return X, V, ridge_hat_factor(V, LAM)


def test_gradient_matches_finite_differences():
    X, V, Mfac = _fixture()
    grad = polarization_grad(X, V, Mfac)
    eps = 1e-6
    for u, j in [(0, 0), (1, 5), (3, 11), (2, 7)]:
        Xp, Xm = X.copy(), X.copy()
        Xp[u, j] += eps
        Xm[u, j] -= eps
        num = (
            polarization_np(predict_antidote(Xp, V, Mfac))
            - polarization_np(predict_antidote(Xm, V, Mfac))
        ) / (2 * eps)
        assert np.isclose(grad[u, j], num, rtol=1e-5, atol=1e-9), (u, j)


def test_step_decreases_objective():
    X, V, Mfac = _fixture()
    before = polarization_np(predict_antidote(X, V, Mfac))
    X1 = antidote_step(X, V, LAM, eta=1.0)
    after = polarization_np(predict_antidote(X1, V, Mfac))
    assert after <= before + 1e-12


def test_step_respects_rating_box():
    X, V, _ = _fixture()
    X1 = antidote_step(X, V, LAM, eta=1e6)  # huge step must still project
    assert X1.min() >= RATING_LO and X1.max() <= RATING_HI


def test_hat_matrix_is_ridge_solution():
    # B = V(VᵀV+λI)⁻¹Vᵀ must satisfy the ridge normal equations:
    # (VᵀV+λI)·M = I  [paper §4 closed form]
    _, V, Mfac = _fixture()
    lhs = (V.T @ V + LAM * np.eye(RANK)) @ Mfac
    assert np.allclose(lhs, np.eye(RANK), atol=1e-10)


def test_predictions_linear_in_ratings():
    # fixed-V linearity [paper §4]: predict(aX+bY) == a·predict(X)+b·predict(Y)
    X, V, Mfac = _fixture()
    Y = np.roll(X, 1, axis=1)
    lhs = predict_antidote(2.0 * X + 0.5 * Y, V, Mfac)
    rhs = 2.0 * predict_antidote(X, V, Mfac) + 0.5 * predict_antidote(Y, V, Mfac)
    assert np.allclose(lhs, rhs, atol=1e-10)


def test_fairness_grad_matches_finite_differences():
    from antidote_data_framework_spark.ml.antidote import (
        fairness_value_grad,
        fairness_value_np,
    )

    X = _det_init(6, M)
    V = _det_factors(M, RANK)
    Mfac = ridge_hat_factor(V, LAM)
    grad = fairness_value_grad(X, V, Mfac)
    eps = 1e-6
    for u, j in [(0, 0), (1, 3), (4, 7), (5, 11)]:
        Xp, Xm = X.copy(), X.copy()
        Xp[u, j] += eps
        Xm[u, j] -= eps
        num = (fairness_value_np(Xp, V, Mfac) - fairness_value_np(Xm, V, Mfac)) / (2 * eps)
        assert np.isclose(grad[u, j], num, rtol=1e-4, atol=1e-10), (u, j)


def test_fairness_step_decreases_objective():
    from antidote_data_framework_spark.ml.antidote import (
        fairness_value_grad,
        fairness_value_np,
    )

    X = _det_init(6, M)
    V = _det_factors(M, RANK)
    Mfac = ridge_hat_factor(V, LAM)
    before = fairness_value_np(X, V, Mfac)
    X1 = np.clip(X - 5.0 * fairness_value_grad(X, V, Mfac), 1.0, 5.0)
    assert fairness_value_np(X1, V, Mfac) <= before + 1e-12
