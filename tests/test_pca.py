"""Golden tests for the distributed Gram / PCA path (ml/pca.py):
the mapInPandas partial-aggregation Gram must equal the local numpy
Gram (within float tolerance), and the PCA projection must reproduce
sklearn-style PCA computed locally — variance ordering included."""

from __future__ import annotations

import numpy as np
import pandas as pd

from antidote_data_framework_spark.ml.pca import gram_df, q_embed_gram_sql, q_pca_project
from tests.conftest import SF_DIR


def _local_embeddings() -> np.ndarray:
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    return np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)


def test_gram_matches_numpy(spark):
    X = _local_embeddings()
    G_local = X.T @ X
    rows = gram_df(spark, SF_DIR, 64).collect()
    assert len(rows) == 64 * 64
    G_dist = np.zeros((64, 64))
    for r in rows:
        assert r["n"] == len(X)
        G_dist[r["i"], r["j"]] = r["gram"]
    np.testing.assert_allclose(G_dist, G_local, rtol=1e-9, atol=1e-8)


def test_gram_sql_slice_consistent(spark):
    """The decimal-exact SQL gram (first 8 dims) must agree with the
    numpy gram — the hash-matched contract entry is also CORRECT, not
    merely stable."""
    X = _local_embeddings()[:, :8]
    G_local = X.T @ X
    out = {(r["i"], r["j"]): r["gram"] for r in q_embed_gram_sql(spark, SF_DIR).collect()}
    assert len(out) == 64
    for i in range(8):
        for j in range(8):
            assert abs(out[(i, j)] - G_local[i, j]) < 1e-5


def test_pca_projection_matches_local(spark):
    X = _local_embeddings()
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    axes = vecs[:, order].T.copy()
    for a in axes:
        if a[np.argmax(np.abs(a))] < 0:
            a *= -1.0
    expected = X @ axes.T  # n x 2 (un-centered projection, as the op)

    out = q_pca_project(spark, SF_DIR).orderBy("vec_id").toPandas()
    assert len(out) == len(X)
    got = out[["pc1", "pc2"]].to_numpy()
    np.testing.assert_allclose(got, expected, atol=5e-3)
    # PC1 must carry at least as much variance as PC2 on the actual data
    assert got[:, 0].var() >= got[:, 1].var() - 1e-9
