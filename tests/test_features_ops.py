"""Property tests for the feature-engineering operators — independent
Python/numpy replays and structural laws on top of the differential
oracle."""

from __future__ import annotations

import duckdb
import numpy as np

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_target_encoding_shrinks_toward_prior(spark, sf_dir):
    rows = QUERIES["q_target_encoding"](spark, sf_dir).collect()
    assert len(rows) == 25
    gn = sum(r["n"] for r in rows)
    gs = sum(r["n_pos"] for r in rows)
    prior = gs / gn
    for r in rows:
        naive = r["n_pos"] / r["n"]
        lo, hi = sorted((naive, prior))
        # smoothing is a convex combination of naive mean and prior
        assert lo - 1e-6 <= r["enc_smoothed"] <= hi + 1e-6
        assert r["enc_loo_min"] <= r["enc_loo_max"] + 1e-12
        # replay the smoothed encoding exactly
        expect = (r["n_pos"] + 20.0 * prior) / (r["n"] + 20.0)
        assert abs(r["enc_smoothed"] - expect) < 1e-5


def test_feature_scaling_matches_numpy(spark, sf_dir):
    vals = duckdb.sql(
        "SELECT event_type, CAST(ROUND(value*100,0) AS BIGINT) c "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by = {}
    for t, c in vals:
        by.setdefault(t, []).append(c)
    out = {r["event_type"]: r for r in QUERIES["q_feature_scaling"](spark, sf_dir).collect()}
    assert set(out) == set(by)
    for t, xs in by.items():
        a = np.array(xs, dtype=np.float64)
        r = out[t]
        assert r["n"] == len(xs)
        assert r["min_cents"] == int(a.min()) and r["max_cents"] == int(a.max())
        assert abs(r["mean_cents"] - a.mean()) < 1e-3
        assert abs(r["std_cents"] - a.std()) < 1e-3
        for q, col in ((25, "q1_cents"), (50, "median_cents"), (75, "q3_cents")):
            assert abs(r[col] - np.percentile(a, q)) < 0.11
        assert abs(r["iqr_cents"] - (r["q3_cents"] - r["q1_cents"])) < 0.11


def test_feature_hashing_partitions_all_tokens(spark, sf_dir):
    n_tokens = duckdb.sql(
        "SELECT COUNT(*) FROM (SELECT UNNEST(string_split(text,' ')) w "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) WHERE w <> ''"
    ).fetchone()[0]
    n_vocab = duckdb.sql(
        "SELECT COUNT(DISTINCT w) FROM (SELECT UNNEST(string_split(text,' ')) w "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) WHERE w <> ''"
    ).fetchone()[0]
    rows = QUERIES["q_feature_hashing"](spark, sf_dir).collect()
    assert sum(r["n_occurrences"] for r in rows) == n_tokens
    assert sum(r["n_features"] for r in rows) == n_vocab  # buckets partition the vocab
    for r in rows:
        assert 0 <= r["bucket"] < 64
        assert r["n_features"] >= 1
        assert r["example_feature"]


def test_dsir_top50_enriched_in_target_language(spark, sf_dir):
    """The defining DSIR property: selecting by target/proposal LLR
    must over-represent the target domain vs the corpus base rate."""
    rows = QUERIES["q_dsir_importance"](spark, sf_dir).collect()
    assert len(rows) == 50
    langs = dict(
        duckdb.sql(
            "SELECT doc_id, lang FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    frac_top = sum(1 for r in rows if langs[r["doc_id"]] == "en") / len(rows)
    frac_all = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert frac_top > frac_all
    scores = [r["llr_per_token"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_survivorship_survivor_maximal_in_cluster(spark, sf_dir):
    clusters = duckdb.sql(
        """
        WITH canon AS (
          SELECT doc_id, n_chars,
                 md5(array_to_string(list_sort(list_distinct(
                   string_split(lower(trim(text)), ' '))), ' ')) AS ckey
          FROM read_parquet('{p}/documents.parquet')
        )
        SELECT ckey, list(doc_id ORDER BY n_chars DESC, doc_id) ids,
               MAX(n_chars) mx, COUNT(*) n
        FROM canon GROUP BY ckey HAVING COUNT(*) >= 2
        """.format(p=sf_dir)
    ).fetchall()
    expect = {ids[0]: (mx, n) for _, ids, mx, n in clusters}
    rows = QUERIES["q_dedup_survivorship"](spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        mx, n = expect[r["survivor_id"]]
        assert r["survivor_chars"] == mx
        assert r["n_members"] == n
        assert r["sources"] == ",".join(sorted(set(r["sources"].split(","))))
