"""Property tests for the retrieval / stats / sketch / layout batch:
laws the differential oracle can't express — scipy-free closed-form
cross-checks, sketch error bounds, and layout invariants."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_bm25_scores_against_numpy(spark, sf_dir):
    """Recompute BM25 for the returned top-20 docs from raw token
    counts in numpy; every score must match to the rounding grain."""
    from antidote_data_framework_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
    )
    from antidote_data_framework_spark.sources import load_table

    got = {r["doc_id"]: r["bm25"] for r in QUERIES["q_bm25_search"](spark, sf_dir).collect()}
    assert len(got) == 20

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in BM25_QUERY_TERMS
    }
    for doc_id, expect in got.items():
        toks = docs[doc_id]
        dl = len(toks)
        score = 0.0
        for t in BM25_QUERY_TERMS:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        assert abs(score - expect) < 1e-3, (doc_id, score, expect)


def test_tfidf_rank_is_dense_per_doc(spark, sf_dir):
    """Every document emits ranks exactly 1..3 (vocab >= 3 terms per
    doc in the fixture), and zero-idf terms (df == N) can never
    outrank a positive-idf term with tf >= 1."""
    out = QUERIES["q_tfidf_topterms"](spark, sf_dir)
    ranks = (
        out.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("rnk")).alias("rr"))
        .select("rr")
        .distinct()
        .collect()
    )
    assert [r["rr"] for r in ranks] == [[1, 2, 3]]
    # a rank-1 score of 0.0 implies every term in that doc is corpus-wide
    bad = out.filter((F.col("rnk") == 1) & (F.col("tfidf") > 0)).count()
    assert bad > 0  # fixture has discriminative vocabulary


def test_chisq_matches_numpy(spark, sf_dir):
    """chi2 equals the numpy contingency computation exactly (to the
    rounding grain) and dof = (rows-1)(cols-1)."""
    from antidote_data_framework_spark.sources import load_table

    row = QUERIES["q_chisq_independence"](spark, sf_dir).collect()[0]
    obs_rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .count()
        .collect()
    )
    ps = sorted({r["o_orderpriority"] for r in obs_rows})
    ss = sorted({r["o_orderstatus"] for r in obs_rows})
    m = np.zeros((len(ps), len(ss)))
    for r in obs_rows:
        m[ps.index(r["o_orderpriority"]), ss.index(r["o_orderstatus"])] = r["count"]
    exp = m.sum(1, keepdims=True) * m.sum(0, keepdims=True) / m.sum()
    chi2 = ((m - exp) ** 2 / exp).sum()
    assert row["dof"] == (len(ps) - 1) * (len(ss) - 1)
    assert abs(row["chi2"] - chi2) < 1e-3
    assert row["n_cells"] == (m > 0).sum()


def test_welch_ttest_matches_numpy(spark, sf_dir):
    """t-statistic equals the numpy Welch formula on the same split."""
    from antidote_data_framework_spark.sources import load_table

    row = QUERIES["q_ab_welch_ttest"](spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("arm"), "value")
        .collect()
    )
    a = np.array([r["value"] for r in ev if r["arm"] == 1])
    b = np.array([r["value"] for r in ev if r["arm"] == 0])
    t = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert row["n_treat"] == len(a) and row["n_ctrl"] == len(b)
    assert abs(row["t_stat"] - t) < 1e-3
    assert abs(row["lift"] - (a.mean() - b.mean())) < 1e-3


def test_countmin_estimate_never_undercounts(spark, sf_dir):
    """The CMS law: estimate >= true count for every probed key, and
    the total overcount is bounded by the sketch error (sum of all
    other keys' mass landing in shared cells: <= e/w * stream_len
    per row with prob; here just assert one-sidedness + sanity)."""
    rows = QUERIES["q_countmin_sketch"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_estimate"] == r["true_count"] + r["overcount"]


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir):
    """Compaction must move bytes, never rows: identical n_rows across
    stages, strictly fewer files after, larger files after."""
    rows = {r["stage"]: r for r in QUERIES["q_sink_compaction"](spark, sf_dir).collect()}
    frag, comp = rows["fragmented"], rows["compacted"]
    assert frag["n_rows"] == comp["n_rows"]
    assert comp["n_files"] < frag["n_files"]
    assert comp["min_rows_per_file"] > frag["max_rows_per_file"]


def test_multires_rollup_is_lossless(spark, sf_dir):
    """Additivity law: every resolution tier must sum to the same
    corpus totals (count and cents) — the cascade loses nothing."""
    out = QUERIES["q_rollup_multires"](spark, sf_dir)
    totals = (
        out.groupBy("resolution")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .collect()
    )
    assert len(totals) == 3
    ns = {r["n"] for r in totals}
    cents = {r["cents"] for r in totals}
    assert len(ns) == 1 and len(cents) == 1


def test_k_anonymity_partitions_everyone(spark, sf_dir):
    """Every customer lands in exactly one privacy level, and every
    non-suppressed class is >= k=5."""
    from antidote_data_framework_spark.sources import load_table

    rows = {r["level"]: r for r in QUERIES["q_k_anonymity"](spark, sf_dir).collect()}
    total = sum(r["n_customers"] for r in rows.values())
    assert total == load_table(spark, sf_dir, "customer").count()
    for level, r in rows.items():
        if level != "suppressed":
            assert r["min_class"] >= 5, r


def test_psi_drift_is_nonnegative_and_proportions_sum_to_one(spark, sf_dir):
    """PSI terms are each >= 0 ((p-q)ln(p/q) has the sign of its two
    factors aligned) and bucket proportions are distributions."""
    rows = QUERIES["q_psi_drift"](spark, sf_dir).collect()
    assert len(rows) == 4
    assert abs(sum(r["p_ref"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["p_cur"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["psi_term"] >= 0
    assert abs(rows[0]["psi_total"] - sum(r["psi_term"] for r in rows)) < 1e-5


def test_quarantine_split_is_structural(spark, sf_dir):
    """Exactly every 10th staged line is corrupt: 180 clean / 20
    quarantined, and the clean route carries a cents checksum."""
    rows = {r["route"]: r for r in QUERIES["q_source_quarantine_corrupt"](spark, sf_dir).collect()}
    assert rows["clean"]["n_rows"] == 180
    assert rows["quarantined"]["n_rows"] == 20
    assert rows["clean"]["cents"] > 0
    assert rows["quarantined"]["cents"] is None


def test_rfm_segments_partition_all_purchasers(spark, sf_dir):
    """Segment user counts sum to the distinct purchaser count and
    segment labels come from the 8-cell RFM cube."""
    from antidote_data_framework_spark.sources import load_table

    rows = QUERIES["q_rfm_segments"](spark, sf_dir).collect()
    n_purchasers = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_purchasers
    valid = {
        f"{r}/{f}/{m}"
        for r in ("R-hi", "R-lo")
        for f in ("F-hi", "F-lo")
        for m in ("M-hi", "M-lo")
    }
    assert {r["segment"] for r in rows} <= valid


def test_streaks_match_bruteforce(spark, sf_dir):
    """Longest streaks must equal a driver-side brute-force consecutive
    -day computation for every returned user."""
    from antidote_data_framework_spark.sources import load_table

    got = {
        r["user_id"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"])
        for r in QUERIES["q_gaps_islands_streaks"](spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .collect()
    )
    from collections import defaultdict

    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(r["d"].date())
    for uid, (nd, ns, longest) in got.items():
        ds = sorted(days[uid])
        assert nd == len(ds)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert ns == len(streaks), uid
        assert longest == max(streaks), uid
        assert longest >= 3


def test_benford_is_a_distribution(spark, sf_dir):
    """Observed and Benford proportions both sum to ~1 over digits
    1..9; deviations are consistent: |p_obs - p_benford| == abs_dev."""
    rows = QUERIES["q_benford_audit"](spark, sf_dir).collect()
    ds = sorted(r["d"] for r in rows)
    assert ds == list(range(1, len(ds) + 1))
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert abs(abs(r["p_obs"] - r["p_benford"]) - r["abs_dev"]) < 2e-4


def test_maparrow_norms_match_jvm_twin(spark, sf_dir):
    """The Arrow-kernel norms must equal the codegen aggregate-based
    norms row for row — the Python boundary may never drift."""
    from antidote_data_framework_spark.operators.vectors import dot_product
    from antidote_data_framework_spark.sources import load_table

    got = {
        r["vec_id"]: r["l2_norm"]
        for r in QUERIES["q_maparrow_norms"](spark, sf_dir).collect()
    }
    jvm = {
        r["vec_id"]: r["n"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.round(
                F.sqrt(dot_product(F.col("embedding"), F.col("embedding"))), 4
            ).alias("n"),
        )
        .collect()
    }
    assert len(got) == len(jvm)
    for k, v in got.items():
        assert abs(v - jvm[k]) < 1e-3, k


def test_corr_matrix_matches_numpy(spark, sf_dir):
    """Every pair's r must equal numpy's corrcoef on the raw columns."""
    from antidote_data_framework_spark.sources import load_table

    rows = {r["pair"]: r for r in QUERIES["q_corr_matrix"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    q = np.array([r["l_quantity"] for r in li], dtype=float)
    p = np.array([r["l_extendedprice"] for r in li])
    d = np.array([r["l_discount"] for r in li])
    assert abs(rows["qty_price"]["r"] - np.corrcoef(q, p)[0, 1]) < 1e-3
    assert abs(rows["qty_discount"]["r"] - np.corrcoef(q, d)[0, 1]) < 1e-3
    assert abs(rows["price_discount"]["r"] - np.corrcoef(p, d)[0, 1]) < 1e-3


def test_time_to_convert_bounds(spark, sf_dir):
    """Latencies are within (0, 24 h]; percentiles are ordered."""
    r = QUERIES["q_time_to_convert"](spark, sf_dir).collect()[0]
    assert r["n_conversions"] > 0
    assert 0 < r["min_secs"] <= r["p50_secs"] <= r["p90_secs"] <= r["max_secs"]
    assert r["max_secs"] <= 24 * 3600


def test_codec_tradeoff_rows_invariant_and_sizes_ordered(spark, sf_dir):
    """Compression changes bytes, never rows; uncompressed is the
    largest layout."""
    rows = {r["codec"]: r for r in QUERIES["q_sink_codec_tradeoff"](spark, sf_dir).collect()}
    assert len({r["n_rows"] for r in rows.values()}) == 1
    assert rows["none"]["n_bytes"] > rows["snappy"]["n_bytes"]
    assert rows["none"]["n_bytes"] > rows["zstd"]["n_bytes"]


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Winnowing's core theorem: documents sharing a token run of
    length >= W + K - 1 must share at least one fingerprint.  Built
    on a synthetic 2-doc fixture with a planted 6-token shared run
    and otherwise-disjoint vocabulary."""
    from antidote_data_framework_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
    )
    from antidote_data_framework_spark.sources import fixtures

    shared = "alpha beta gamma delta epsilon zeta"  # W+K-1 = 6 tokens
    assert len(shared.split()) == WINNOW_W + WINNOW_K - 1
    docs = spark.createDataFrame(
        [
            (0, f"one two three {shared} four five six", "en", "src0", 0),
            (1, f"seven eight nine ten {shared} eleven", "en", "src1", 0),
            (2, "completely different words everywhere here now", "en", "src2", 0),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    )
    fix = tmp_path / "sfW"
    fix.mkdir()
    docs.coalesce(1).write.mode("overwrite").parquet(str(fix / "documents.parquet"))
    fixtures._DF_CACHE.clear()
    try:
        out = QUERIES["q_doc_winnowing"](spark, str(fix))
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {0, 1, 2}
        # recompute the fingerprint SETS via the same registered plan
        # semantics: equal checksums for doc 0/1 would be a fluke, so
        # assert set overlap directly with a python mirror
        def mirror(text):
            # the r10 (length, first char, last two chars) token hash —
            # see textstats._winnow_tok_hash
            s = [
                0
                if len(t) == 0
                else len(t) * 1009
                + ord(t[0]) * 31
                + ord(t[max(len(t) - 2, 0)]) * 7
                + ord(t[-1])
                for t in text.split(" ")
            ]
            h = [
                (s[i] * 131 * 131 + s[i + 1] * 131 + s[i + 2]) % 1000000007
                for i in range(len(s) - WINNOW_K + 1)
            ]
            return {
                min(h[i : i + WINNOW_W]) for i in range(len(h) - WINNOW_W + 1)
            }
        f0 = mirror(f"one two three {shared} four five six")
        f1 = mirror(f"seven eight nine ten {shared} eleven")
        f2 = mirror("completely different words everywhere here now")
        assert f0 & f1, "shared 6-token run produced no shared fingerprint"
        # spark output agrees with the mirror on counts and checksum
        for did, fset in [(0, f0), (1, f1), (2, f2)]:
            assert rows[did]["n_fingerprints"] == len(fset)
            assert rows[did]["fp_checksum"] == sum(fset) % 1000000007
    finally:
        fixtures._DF_CACHE.clear()
