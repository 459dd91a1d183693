"""Property tests for the round-13 batch (chunk-granular corpus
rewrite): reassembly-fidelity and conservation laws on top of the
DuckDB hash-match.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_chunk_rewrite_reassembly_is_lossless(spark, sf_dir):
    """A document that lost no chunks must rewrite to EXACTLY its
    original text: 32-token chunks joined by ' ' round-trip the
    whitespace tokenization, so clean_md5 == md5(text).  This pins the
    reassembly path (slice -> sort_array -> array_join) independently
    of the oracle, which could agree on a mutually wrong convention."""
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_chunk_rewrite"](spark, sf_dir).collect()
    }
    originals = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
        .collect()
    )
    intact = [
        (r["doc_id"], r["text"])
        for r in originals
        if out[r["doc_id"]]["tokens_kept"] == out[r["doc_id"]]["tokens_total"]
    ]
    assert intact, "fixture corpus should contain at least one intact doc"
    for doc_id, text in intact:
        expect = hashlib.md5(text.encode()).hexdigest()
        assert out[doc_id]["clean_md5"] == expect, doc_id


def test_chunk_rewrite_conserves_tokens_against_prune(spark, sf_dir):
    """The rewrite's kept/total accounting must equal chunk_prune's —
    the two operators elect keepers with the same packed-min rule, so
    disagreement means one of them dropped or double-counted a chunk.
    Also: summed tokens_kept across docs equals the number of DISTINCT
    chunk instances kept corpus-wide (each hash keeps exactly one
    owner), which must be <= tokens_total with equality iff there are
    no cross-copy chunks."""
    rw = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_chunk_rewrite"](spark, sf_dir).collect()
    }
    pr = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_chunk_prune"](spark, sf_dir).collect()
    }
    assert set(rw) == set(pr)
    for doc_id in rw:
        assert rw[doc_id]["tokens_kept"] == pr[doc_id]["tokens_kept"], doc_id
        assert rw[doc_id]["tokens_total"] == pr[doc_id]["tokens_total"], doc_id
    total_kept = sum(r["tokens_kept"] for r in rw.values())
    total_all = sum(r["tokens_total"] for r in rw.values())
    assert 0 < total_kept <= total_all


def test_mmr_matches_numpy_replay(spark, sf_dir):
    """Re-derive the full MMR selection from the raw parquet in numpy
    (same candidate cut, same λ, same tie rule) and require the Spark
    operator to reproduce rank-for-rank ids and scores."""
    import numpy as np
    import pyarrow.parquet as pq

    from antidote_data_framework_spark.operators.vectors import (
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAMBDA,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        int(v): np.asarray(e, dtype=np.float32).astype(np.float64)
        for v, e in zip(t["vec_id"], t["embedding"])
    }
    qv = vecs[0]

    def cos(a, b):
        # left-to-right fold like F.aggregate: np.dot is close enough
        # for 1e-9 comparison on 64-dim unit-scale data
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel = {v: cos(e, qv) for v, e in vecs.items() if v != 0}
    cand = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_CANDIDATES]
    selected, remaining = [], sorted(cand)
    while remaining and len(selected) < MMR_K:
        best, best_s = None, None
        for i in remaining:
            if selected:
                pen = max(cos(vecs[i], vecs[s]) for s, _ in selected)
                s = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * pen
            else:
                s = MMR_LAMBDA * rel[i]
            if best_s is None or s > best_s:
                best, best_s = i, s
        selected.append((best, best_s))
        remaining.remove(best)

    got = QUERIES["q_retrieval_mmr"](spark, sf_dir).collect()
    assert len(got) == MMR_K
    for row, (vid, score) in zip(got, selected):
        assert row["vec_id"] == vid, (row, vid)
        assert abs(row["mmr_score"] - round(score, 4)) <= 1e-4
        assert abs(row["relevance"] - round(rel[vid], 4)) <= 1e-4


def test_star_components_equals_propagation(spark, sf_dir):
    """The log-round star-contraction components must produce the
    exact labeling of the diameter-round min-label propagation on the
    real near-dup graph (both also hash-match the same recursive-CTE
    oracle)."""
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in QUERIES["q_dedup_components_star"](spark, sf_dir).collect()
    }
    prop = {
        (r["doc_id"], r["cluster_id"])
        for r in QUERIES["q_dedup_components"](spark, sf_dir).collect()
    }
    assert star == prop


def test_star_components_handles_deep_chain(spark):
    """The case star contraction exists for: a path graph of length 64
    (diameter 64) collapses to ONE component rooted at its minimum —
    within the operator's ~log n alternation bound, where plain
    propagation would need 64 rounds.  Plus two disjoint extras: an
    isolated edge and a triangle, to check components don't bleed."""
    from antidote_data_framework_spark.operators.text import star_components

    chain = [(i, i + 1) for i in range(100, 164)]           # path, min=100
    extra = [(500, 501)]                                    # isolated edge
    tri = [(700, 701), (701, 702), (700, 702)]              # triangle
    pairs = spark.createDataFrame(
        chain + extra + tri, "doc_a BIGINT, doc_b BIGINT"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in star_components(pairs).collect()
    }
    assert set(got) == set(range(100, 165)) | {500, 501, 700, 701, 702}
    assert all(got[i] == 100 for i in range(100, 165))
    assert got[500] == got[501] == 500
    assert got[700] == got[701] == got[702] == 700
