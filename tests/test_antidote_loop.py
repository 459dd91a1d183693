"""End-to-end sanity for the antidote queries (rows-only surface):
the step query must agree with the golden-tested numpy core, and the
loop must emit a well-formed, finite metric trajectory."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as entrymod
from antidote_data_framework_spark.ml.antidote import (
    _det_factors,
    _det_init,
    polarization_grad,
    ridge_hat_factor,
)

QUERIES = entrymod.queries()


def test_step_query_matches_numpy_core(spark, sf_dir):
    rows = QUERIES["q_antidote_step"](spark, sf_dir).collect()
    assert len(rows) == 5 * 20
    X0 = _det_init(5, 20)
    V = _det_factors(20, 4)
    grad = polarization_grad(X0, V, ridge_hat_factor(V, 0.1))
    for r in rows[:25]:
        u, j = r["antidote_user"], r["item_idx"]
        assert r["rating_before"] == X0[u, j]
        assert abs(r["grad"] - round(float(grad[u, j]), 6)) < 1e-12
        assert 1.0 <= r["rating_after"] <= 5.0


def test_loop_reduces_polarization_vs_baseline(spark, sf_dir):
    """The paper's headline effect: polarization of the ORIGINAL
    users' predictions is lower with antidote data than without, and
    the gradient steps do not undo the init's gain."""
    rows = sorted(
        QUERIES["q_antidote_loop"](spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    assert [r["iteration"] for r in rows] == [-1, 0, 1, 2]
    for r in rows:
        assert np.isfinite(r["polarization"]) and r["polarization"] >= 0.0
        assert r["n_items"] > 0
    baseline = rows[0]["polarization"]
    final = rows[-1]["polarization"]
    assert final < baseline, (baseline, final)
    assert rows[-1]["improvement_vs_baseline"] > 0.0
    assert final <= rows[1]["polarization"] + 0.01  # steps never materially undo the init


def test_ivf_probed_search_overlaps_exact(spark, sf_dir):
    """IVF result must share >=1 of the exact top-5 (floor for probed
    search on isotropic fixtures; real embeddings score far higher)."""
    exact = {r["vec_id"] for r in QUERIES["q_cosine_topk"](spark, sf_dir).collect()}
    ivf = {r["vec_id"] for r in QUERIES["q_ivf_cosine_topk"](spark, sf_dir).collect()}
    assert len(exact & ivf) >= 1
