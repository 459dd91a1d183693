"""Recall guard for the banded MinHash near-dup operator: every pair
the sketch reports must be a genuine near-dup by exact 2-shingle
Jaccard, and it must recover the strong (>= 0.7) exact pairs with high
recall — the S-curve's designed operating point."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

EXACT_SHINGLE_JACCARD = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS g
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       p.n_common * 1.0 / (ca.n + cb.n - p.n_common) AS jac
FROM pairs p
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b
WHERE p.n_common * 1.0 / (ca.n + cb.n - p.n_common) >= 0.35
"""


def test_minhash_matches_exact_shingle_jaccard(spark, duck, sf_dir):
    exact = {
        (int(r[0]), int(r[1])): float(r[2])
        for r in duck.execute(EXACT_SHINGLE_JACCARD).fetchall()
    }
    strong = {k for k, j in exact.items() if j >= 0.7}
    found = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in QUERIES["q_minhash_lsh"](spark, sf_dir).collect()
    }
    assert found, "banded MinHash reported no candidate pairs"
    # precision: every reported pair is a real near-dup (>= 0.35 exact)
    false_pos = found - set(exact)
    assert len(false_pos) <= max(1, len(found) // 10), (
        f"sketch reported {len(false_pos)}/{len(found)} pairs below 0.35 exact Jaccard"
    )
    # recall on the strong pairs the banding curve is tuned for
    if strong:
        recall = len(found & strong) / len(strong)
        assert recall >= 0.8, f"recall@0.7 = {recall:.2f} over {len(strong)} strong pairs"


def test_incremental_dedup_exact_precision_and_recall(spark, duck, sf_dir):
    """q_dedup_incremental: every emitted pair must EQUAL the exact
    asymmetric Jaccard (precision is exact by construction — stage 3
    verifies with true shingle sets), and the strong (>= 0.7) exact
    new-vs-corpus pairs must be recovered with high recall."""
    exact = {
        (int(r[0]), int(r[1])): float(r[2])
        for r in duck.execute(EXACT_SHINGLE_JACCARD).fetchall()
    }
    # orient exact pairs as (new, corpus): new docs have doc_id%10==9
    asym = {}
    for (a, b), j in exact.items():
        a_new, b_new = a % 10 == 9, b % 10 == 9
        if a_new and not b_new:
            asym[(a, b)] = j
        elif b_new and not a_new:
            asym[(b, a)] = j
    got = {
        (int(r["new_doc_id"]), int(r["dup_of_doc_id"])): float(r["jaccard"])
        for r in QUERIES["q_dedup_incremental"](spark, sf_dir).collect()
    }
    # exact precision: every emitted pair is a true >= 0.6 near-dup
    # with the true Jaccard value
    for k, j in got.items():
        assert k in asym, f"emitted non-pair {k}"
        assert asym[k] >= 0.6
        assert abs(asym[k] - j) < 1e-3
    strong = {k for k, j in asym.items() if j >= 0.7}
    if strong:
        recall = len(strong & set(got)) / len(strong)
        assert recall >= 0.8, f"strong-pair recall {recall:.2f}"
