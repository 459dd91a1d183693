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
    assert all(r["code_bytes"] == 8 and r["float_bytes"] == 256 for r in rows)

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = np.array([r["embedding"] for r in emb])
    ids = [r["vec_id"] for r in emb]
    q = V[ids.index(0)]
    exact = {ids[i] for i in np.argsort(((V - q) ** 2).sum(1))[:10]}
    got = {r["vec_id"] for r in rows}
    assert len(got & exact) / 10 >= 0.1  # measured 0.2 on the fixture
