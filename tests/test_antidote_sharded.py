"""Golden test for the sharded antidote gradient: the distributed
three-pass formulation (q_antidote_grad_sharded) must reproduce the
driver-numpy polarization gradient (ml/antidote.polarization_grad) on
the real fixture items to float tolerance — the proof that the 100 TB
sharding computes the same math as the small-state reference core."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as entrymod
from antidote_data_framework_spark.ml.antidote import (
    RATING_HI,
    RATING_LO,
    polarization_grad,
    ridge_hat_factor,
)
from antidote_data_framework_spark.ml.recsys_data import ratings_df

K, RANK, LAM, ETA = 5, 8, 0.1, 5.0


def _laws(item_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The same deterministic V / X̃ modulo laws the query injects."""
    j = item_ids[:, None]
    p = np.arange(RANK)[None, :]
    V = (((j + 1) * 7 + (p + 1) * 13) % 11) / 11.0 - 0.5
    u = np.arange(K)[:, None]
    X = (1 + (u * 7 + item_ids[None, :] * 13) % 5).astype(np.float64)
    return V, X


def test_sharded_gradient_matches_numpy_core(spark, sf_dir):
    out = (
        entrymod.queries()["q_antidote_grad_sharded"](spark, sf_dir)
        .toPandas()
        .sort_values(["antidote_user", "item_id"])
    )
    item_ids = np.sort(out["item_id"].unique())
    m = len(item_ids)
    assert len(out) == K * m

    V, X = _laws(item_ids)
    M = ridge_hat_factor(V, LAM)
    grad_np = polarization_grad(X, V, M)
    stepped_np = np.clip(X - ETA * grad_np, RATING_LO, RATING_HI)

    pos = {j: idx for idx, j in enumerate(item_ids)}
    grad_q = np.zeros((K, m))
    after_q = np.zeros((K, m))
    before_q = np.zeros((K, m))
    for r in out.itertuples(index=False):
        grad_q[r.antidote_user, pos[r.item_id]] = r.grad
        after_q[r.antidote_user, pos[r.item_id]] = r.rating_after
        before_q[r.antidote_user, pos[r.item_id]] = r.rating_before

    np.testing.assert_allclose(before_q, X)
    # query rounds grad to 10 dp and rating_after to 4 dp
    np.testing.assert_allclose(grad_q, grad_np, atol=1e-9, rtol=1e-6)
    np.testing.assert_allclose(after_q, stepped_np, atol=6e-5)
    # projection stayed inside the rating box
    assert after_q.min() >= RATING_LO and after_q.max() <= RATING_HI
