"""PQ/ADC laws: self-query ranks first, distances are sane, and
recall against the exact L2 search clears the isotropic-data floor
(the fixture's structureless vectors bound recall near the
compression-information limit — same caveat as IVF; on real
embedding manifolds recall concentrates)."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_pq_adc_topk_laws(spark, sf_dir):
    rows = QUERIES["q_pq_adc_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    # the query vector's own row reconstructs closest to itself
    assert rows[0]["vec_id"] == 0
    dists = [r["adc_dist"] for r in rows]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)
    assert all(r["code_bytes"] == 4 and r["float_bytes"] == 256 for r in rows)

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = np.array([r["embedding"] for r in emb])
    ids = [r["vec_id"] for r in emb]
    q = V[ids.index(0)]
    exact = {ids[i] for i in np.argsort(((V - q) ** 2).sum(1))[:10]}
    got = {r["vec_id"] for r in rows}
    assert len(got & exact) / 10 >= 0.1  # measured 0.2 on the fixture


def test_ivfpq_topk_recall_and_laws(spark, sf_dir):
    """IVFADC composition (r5 VERDICT #7): packed 4-bit residual codes
    scored inside nprobe coarse cells.  Recall@10 vs the exact cosine
    search must clear the isotropic floor (measured 0.3 at sf0.001,
    0.5 at sf0.01); distances sorted and non-negative."""
    rows = QUERIES["q_ivfpq_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["code_bytes"] == 4 for r in rows)
    dists = [r["adc_dist"] for r in rows]
    assert all(d >= 0 for d in dists) and dists == sorted(dists)

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = np.array([r["embedding"] for r in emb])
    ids = [r["vec_id"] for r in emb]
    vq = V[ids.index(0)]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ (vq / np.linalg.norm(vq))
    exact = [ids[i] for i in np.argsort(-sims) if ids[i] != 0][:10]
    got = {r["vec_id"] for r in rows}
    assert len(got & set(exact)) / 10 >= 0.1
