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


# ---- synthetic edge cases (r7 VERDICT #6) ----------------------------------


def _write_docs(tmp_path, rows) -> str:
    """Materialize a synthetic documents table as <tmp>/documents.parquet
    so the production queries run on it unchanged (sf_dir contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
        "source": [r["source"] for r in rows],
        "n_chars": [len(r["text"]) for r in rows],
    }
    pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mixture_temperature_single_source_collapses(spark, tmp_path_factory):
    """k=1: every temperature collapses to weight 1.0, boost 1.0, and
    the full token budget — τ sharpening/flattening has nothing to act
    on (n²/n² = n/n = 1/k = 1)."""
    tmp = tmp_path_factory.mktemp("mix_k1")
    rows = [
        {
            "doc_id": i,
            "text": f"tok{i}a tok{i}b tok{i}c tok{i}d",
            "lang": "en",
            "source": "only",
        }
        for i in range(7)
    ]
    sfd = _write_docs(tmp, rows)
    out = QUERIES["q_mixture_temperature"](spark, sfd).collect()
    assert len(out) == 3  # one source x three temperatures
    assert {r["tau"] for r in out} == {"0.5", "1", "inf"}
    tok_total = sum(len(r["text"].split()) for r in rows)
    for r in out:
        assert r["source"] == "only"
        assert r["n_docs"] == 7
        assert r["weight"] == 1.0
        assert r["boost"] == 1.0
        assert r["expected_tokens"] == float(tok_total)


def test_cluster_stats_all_singleton_corpus(spark, tmp_path_factory):
    """A corpus with zero near-duplicates degenerates to ONE histogram
    row: every cluster is a singleton, nothing is redundant, and the
    dup-mass CDF is 1.0 at size 1."""
    tmp = tmp_path_factory.mktemp("singletons")
    rows = [
        {
            "doc_id": i,
            # 12 tokens, all suffixed with the doc index — no shared
            # shingles anywhere, so the pair build finds nothing
            "text": " ".join(f"w{j}d{i}" for j in range(12)),
            "lang": "en",
            "source": f"s{i % 3}",
        }
        for i in range(30)
    ]
    sfd = _write_docs(tmp, rows)
    out = QUERIES["q_dedup_cluster_stats"](spark, sfd).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cluster_size"] == 1
    assert r["n_clusters"] == 30
    assert r["n_docs"] == 30
    assert r["total_tokens"] == 30 * 12
    assert r["redundant_tokens"] == 0
    assert r["cum_token_share"] == 1.0
