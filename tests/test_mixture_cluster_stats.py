"""Invariant tests for the round-7 diagnostics queries:
q_dedup_cluster_stats (dup-mass distribution) and
q_mixture_temperature (temperature-scaled source mixing)."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_cluster_stats_conserves_corpus(spark, sf_dir):
    """The size histogram is a PARTITION of the corpus: doc and token
    totals must equal the documents table exactly, redundant tokens
    must be total minus one survivor's share per cluster, and the CDF
    must start at 1.0 from the largest size and be monotone."""
    rows = sorted(
        QUERIES["q_dedup_cluster_stats"](spark, sf_dir).collect(),
        key=lambda r: r["cluster_size"],
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).first()
    assert sum(r["n_docs"] for r in rows) == docs["n"]
    assert sum(r["total_tokens"] for r in rows) == docs["tok"]
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        if r["cluster_size"] == 1:
            assert r["redundant_tokens"] == 0
        else:
            assert 0 < r["redundant_tokens"] < r["total_tokens"]
    # CDF: clusters of size >= smallest size hold the WHOLE corpus,
    # and the share shrinks as the size floor rises
    assert rows[0]["cum_token_share"] == 1.0
    shares = [r["cum_token_share"] for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_mixture_temperature_weight_laws(spark, sf_dir):
    rows = QUERIES["q_mixture_temperature"](spark, sf_dir).collect()
    by_tau: dict[str, list] = {}
    for r in rows:
        by_tau.setdefault(r["tau"], []).append(r)
    assert set(by_tau) == {"0.5", "1", "inf"}
    n_sources = len(by_tau["1"])
    for tau, group in by_tau.items():
        assert len(group) == n_sources
        assert math.isclose(sum(r["weight"] for r in group), 1.0, abs_tol=1e-4)
    # tau=1 boost is exactly 1 for every source
    assert all(r["boost"] == 1.0 for r in by_tau["1"])
    # tau<1 sharpens: the largest source's boost >= 1 >= the smallest's
    sharp = sorted(by_tau["0.5"], key=lambda r: r["n_docs"])
    assert sharp[-1]["boost"] >= 1.0 >= sharp[0]["boost"]
    # tau->inf flattens: the smallest source is boosted, largest damped
    flat = sorted(by_tau["inf"], key=lambda r: r["n_docs"])
    assert flat[0]["boost"] >= 1.0 >= flat[-1]["boost"]
    # uniform weights are identical across sources
    assert len({r["weight"] for r in by_tau["inf"]}) == 1
