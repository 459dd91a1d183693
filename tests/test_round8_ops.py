"""Property tests for the round-8 batch (EWMA, exact median/mode,
chunk pruning, semantic dedup, prefix-filter join, token budget, geo
kNN): laws the differential oracle can't express — completeness
guarantees, bound checks, and brute-force cross-checks on the tiny SF.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table

QUERIES = entrymod.queries()


def test_ewma_is_bounded_by_window_extremes(spark, sf_dir):
    """Any weighted average with positive weights lies in
    [min, max] of its window; spot-check with a per-user replay."""
    rows = QUERIES["q_ewma_smooth"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in list(by_user.items())[:20]:
        rs.sort(key=lambda r: r["rn"])
        cs = [r["c"] for r in rs]
        for i, r in enumerate(rs):
            win = cs[max(0, i - 11) : i + 1]
            assert min(win) - 1e-6 <= r["ewma_cents"] <= max(win) + 1e-6
            # binary decay: the newest sample carries >= half the weight
            # of the whole window, so the EWMA sits within half the
            # window range of the newest value.
            assert abs(r["ewma_cents"] - cs[i]) <= (max(win) - min(win)) / 2 + 1e-6


def test_ewma_first_row_equals_value(spark, sf_dir):
    rows = QUERIES["q_ewma_smooth"](spark, sf_dir).collect()
    for r in rows:
        if r["rn"] == 1:
            assert r["ewma_cents"] == float(r["c"])


def test_median_mode_against_python(spark, sf_dir):
    """Brute-force the order statistics per group from raw rows."""
    import statistics

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in QUERIES["q_agg_exact_median_mode"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    groups: dict = {}
    for r in li:
        groups.setdefault((r["l_returnflag"], r["l_linestatus"]), []).append(
            r["l_quantity"]
        )
    assert set(got) == set(groups)
    for key, vals in groups.items():
        r = got[key]
        assert r["n_rows"] == len(vals)
        assert abs(r["median_qty"] - statistics.median(vals)) < 1e-6
        counts: dict = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        best = max(counts.values())
        assert r["mode_cnt"] == best
        assert r["mode_qty"] == min(v for v, c in counts.items() if c == best)


def test_chunk_prune_conserves_tokens_and_keeps_first_doc_intact(spark, sf_dir):
    rows = QUERIES["q_dedup_chunk_prune"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    total_kept = 0
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert r["tokens_kept"] <= r["tokens_total"]
        assert r["tokens_total"] == len(docs[r["doc_id"]].split(" "))
        total_kept += r["tokens_kept"]
    # the corpus-wide kept set contains every DISTINCT chunk exactly once
    all_chunks = []
    for text in docs.values():
        toks = text.split(" ")
        for i in range(0, len(toks), 32):
            all_chunks.append(" ".join(toks[i : i + 32]))
    distinct_tokens = sum(
        len(c.split(" ")) for c in dict.fromkeys(all_chunks)
    )
    assert total_kept == distinct_tokens


def test_semantic_dedup_keeper_properties(spark, sf_dir):
    rows = QUERIES["q_semantic_dedup"](spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert len(by_id) == len(rows)  # one row per vector
    for r in rows:
        assert r["keeper_id"] <= r["vec_id"]
        assert r["is_kept"] == (r["keeper_id"] == r["vec_id"])
        if not r["is_kept"]:
            # a keeper pointer must target a vector in the same bucket
            assert by_id[r["keeper_id"]]["bucket"] == r["bucket"]


def test_prefix_join_is_complete_vs_bruteforce(spark, sf_dir):
    """Prefix filtering must lose NOTHING: compare against the
    all-pairs exact Jaccard >= 0.9 on the operator's doc cohort."""
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["q_setsim_prefix_join"](spark, sf_dir).collect()
    }
    sets = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["doc_id"] % 20 == 0
    }
    expect = {}
    for (da, sa), (db, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= 0.9:
            expect[(da, db)] = round(inter / union, 4)
    assert got == expect


def test_token_budget_caps_and_budget(spark, sf_dir):
    rows = QUERIES["q_corpus_token_budget"](spark, sf_dir).collect()
    corpus_tokens = sum(r["tokens"] for r in rows)
    for r in rows:
        assert 0 < r["epochs"] <= 4.0
        assert r["tokens_served"] <= 4 * r["tokens"]
    # allocations never exceed the budget (floor rounding only loses)
    assert sum(r["alloc_tokens"] for r in rows) <= 0.5 * corpus_tokens + 1


def test_geo_knn_nearest_is_truly_nearest_within_neighborhood(spark, sf_dir):
    """Replay the 3x3-cell search in Python; the picked supplier must
    be the true within-neighborhood argmin with suppkey tie-break."""
    rows = QUERIES["q_geo_grid_knn"](spark, sf_dir).collect()
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey").collect()
    sup_pts = {}
    for r in supp:
        k = r["s_suppkey"]
        sup_pts[k] = (-60 + (k * 6271 % 12000) / 100.0, -180 + (k * 99991 % 36000) / 100.0)
    import math

    for r in rows:
        clat, clon = r["c_lat"], r["c_lon"]
        ccell = (math.floor(clat / 5), math.floor(clon / 5))
        cands = []
        for k, (slat, slon) in sup_pts.items():
            scell = (math.floor(slat / 5), math.floor(slon / 5))
            if abs(scell[0] - ccell[0]) <= 1 and abs(scell[1] - ccell[1]) <= 1:
                d2 = (clat - slat) ** 2 + (clon - slon) ** 2
                cands.append((d2, k))
        if not cands:
            assert r["nearest_suppkey"] is None
        else:
            d2, k = min(cands)
            assert r["nearest_suppkey"] == k
            assert abs(r["dist2_deg"] - round(d2, 4)) < 1e-6


def test_t_closeness_emd_bounds(spark, sf_dir):
    """EMD over 4 bands is bounded by 2*max_cum/3 <= 1; classes
    equal to the global distribution must score ~0."""
    rows = QUERIES["q_t_closeness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["emd"] <= 1.0
        assert r["passes_t"] == (r["emd"] <= 0.2)
    # the union of all classes IS the global distribution, so the
    # class-size-weighted mean EMD must be well below the max
    total = sum(r["class_sz"] for r in rows)
    wmean = sum(r["emd"] * r["class_sz"] for r in rows) / total
    assert wmean < 0.5


def test_random_projection_preserves_norms_on_average(spark, sf_dir):
    """JL: E[norm_ratio] = 1; check the population mean is close and
    every ratio is positive and finite."""
    rows = QUERIES["q_random_projection"](spark, sf_dir).collect()
    assert rows
    ratios = [r["norm_ratio"] for r in rows]
    for r in rows:
        assert r["norm_ratio"] > 0
        assert len(r["proj_units"].split(",")) == 16
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, f"JL mean norm ratio drifted: {mean}"


def test_grouped_ols_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer solve must agree with numpy's QR-based lstsq."""
    import numpy as np

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["q_grouped_ols_multivar"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    groups: dict = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], round(r["l_discount"] * 100), round(r["l_extendedprice"] * 100))
        )
    for g, rows in groups.items():
        X = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
        y = np.array([float(y) for _, _, y in rows])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        r = got[g]
        assert r["n"] == len(rows)
        assert abs(r["beta0_cents"] - beta[0]) < max(1e-2, abs(beta[0]) * 1e-5)
        assert abs(r["beta1_cents_per_qty"] - beta[1]) < max(1e-3, abs(beta[1]) * 1e-5)
        assert abs(r["beta2_cents_per_pct"] - beta[2]) < max(1e-3, abs(beta[2]) * 1e-5)


def test_stable_row_ids_are_contiguous_rank(spark, sf_dir):
    rows = QUERIES["q_stable_row_ids"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r["o_orderkey"])
    assert [r["stable_id"] for r in rows] == list(range(len(rows)))


def test_seasonal_baseline_cells_bounded(spark, sf_dir):
    rows = QUERIES["q_seasonal_baseline"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dow"] <= 7
        assert 0 <= r["hod"] <= 23
        assert r["min_n"] <= r["mean_n"] <= r["max_n"]
        if r["has_spike"]:
            assert r["n_obs"] >= 4 and r["max_n"] - r["mean_n"] > 2 * r["sd_n"]


def test_split_by_group_has_zero_leakage_and_covers_all(spark, sf_dir):
    rows = QUERIES["q_split_by_group"](spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "test"}
    for r in rows:
        assert r["n_leaked_users"] == 0
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_rows"] for r in rows) == ev.count()
    assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()


def test_shard_packing_is_balanced_and_complete(spark, sf_dir):
    rows = QUERIES["q_shard_packing"](spark, sf_dir).collect()
    assert len(rows) == 16
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first()["t"]
    assert sum(r["shard_tokens"] for r in rows) == total_tokens
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # serpentine LPT: every shard within 5% of the mean token load
    for r in rows:
        assert 0.95 <= r["balance_ratio"] <= 1.05, rows


def test_bitmap_membership_equals_semi_join(spark, sf_dir):
    """The bitmap path must agree with a plain semi-join census."""
    got = {
        r["c_mktsegment"]: r
        for r in QUERIES["q_bitmap_membership"](spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    for r in semi:
        assert got[r["c_mktsegment"]]["n_with_orders"] == r["count"]


def test_anova_f_matches_reference_formula(spark, sf_dir):
    """Recompute F from raw rows in Python."""
    r = QUERIES["q_anova_oneway"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups: dict = {}
    for row in ev:
        groups.setdefault(row["event_type"], []).append(round(row["value"] * 100))
    k = len(groups)
    nt = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / nt
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert r["n_groups"] == k and r["n_total"] == nt
    assert abs(r["f_stat"] - f) < max(1e-4, abs(f) * 1e-6)


def test_poisson_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    r = QUERIES["q_poisson_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r["n_replicates"] == 32
    assert r["ci_lo"] <= r["point_mean_cents"] <= r["ci_hi"]
    assert r["se_boot"] > 0
    # CI width should be a few standard errors, not degenerate or huge
    assert (r["ci_hi"] - r["ci_lo"]) < 10 * r["se_boot"]
