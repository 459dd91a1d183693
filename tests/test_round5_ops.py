"""Round-5 operator semantics: bloom-prune equivalence + selectivity,
triangle-census invariants, ranking-metric bounds.

(The differential oracle test in test_oracle_parity.py already
hash-matches each of these against DuckDB; these tests pin the
SEMANTIC claims the oracle can't see — that the bloom prefilter
actually prunes, that the degree-oriented triangle count equals the
naive count, that the ranking metrics sit in their lawful ranges.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

import antidote_data_framework_spark.ml  # noqa: F401  (registers ML queries)
from antidote_data_framework_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    sized_m_bits,
)
from antidote_data_framework_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_real_pruning(spark):
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = bloom_build(seg, "c_custkey", sized_m_bits(seg.count()))
    cand = (
        orders.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain("bloom", "o_custkey"))
        .drop("bloom", "m_bits")
    )
    n_orders = orders.count()
    n_cand = cand.count()
    n_true = orders.join(
        seg, orders.o_custkey == seg.c_custkey, "left_semi"
    ).count()
    # no false negatives: every true match survives the prefilter
    n_cand_true = cand.join(
        seg, cand.o_custkey == seg.c_custkey, "left_semi"
    ).count()
    assert n_cand_true == n_true
    # the filter actually prunes (candidates are a strict subset of the
    # fact table unless the segment covers every customer)
    assert n_true <= n_cand < n_orders
    # false-positive rate is sane for m=2^17, k=3 at this scale
    assert (n_cand - n_true) / max(1, n_orders - n_true) < 0.05


def test_triangle_count_matches_naive_enumeration(spark):
    li = load_table(spark, SF, "lineitem")
    ea = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    eb = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    # same support>=2 edge rule as the operator
    und = (
        ea.join(eb, "k")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .cache()
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    naive = e1.join(e2, "b").join(e3, ["a", "c"]).count()

    from antidote_data_framework_spark.registry import QUERIES

    row = QUERIES["q_graph_triangles"](spark, SF).collect()[0]
    assert row.n_triangles == naive
    assert row.n_edges == und.count()
    # clustering coefficient is a fraction of closed wedges
    assert 0.0 <= row.clustering_coeff <= 1.0
    assert row.n_wedges >= 3 * row.n_triangles


def test_ranking_metrics_lawful_ranges(spark):
    from antidote_data_framework_spark.registry import QUERIES

    row = QUERIES["q_rec_eval_ranking"](spark, SF).collect()[0]
    assert row.n_users > 0
    for m in ("precision_at_k", "recall_at_k", "ndcg_at_k", "mrr_at_k"):
        assert 0.0 <= getattr(row, m) <= 1.0, m
    # with k=5 and a graded holdout there must be SOME signal
    assert row.ndcg_at_k > 0.0


def test_constraint_audit_all_pass_on_clean_fixtures(spark):
    from antidote_data_framework_spark.registry import QUERIES

    rows = QUERIES["q_constraint_audit"](spark, SF).collect()
    assert len(rows) == 6
    assert all(r.passed for r in rows), [
        (r.check_name, r.observed) for r in rows if not r.passed
    ]


def test_hll_reagg_accuracy_vs_exact(spark):
    from pyspark.sql import functions as F2

    from antidote_data_framework_spark.registry import QUERIES

    approx = {
        (r.month, r.o_orderpriority): r.approx_distinct_custs
        for r in QUERIES["q_reagg_hll_sketch"](spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders")
    exact = {
        (r.month, r.o_orderpriority): r.n
        for r in orders.groupBy(
            F2.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderpriority",
        )
        .agg(F2.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        rel = abs(est - exact[k]) / max(1, exact[k])
        assert rel < 0.02, f"{k}: HLL est {est} vs exact {exact[k]} ({rel:.3f})"
