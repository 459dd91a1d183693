"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``antidote_data_framework_spark``: the engine's registry
holds one entry per implemented operator from SURVEY.md §2, plus the
matching DuckDB oracle SQL for every SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import antidote_data_framework_spark as engine  # noqa: E402
import antidote_data_framework_spark.operators  # noqa: E402,F401  (registers queries)
import antidote_data_framework_spark.ml  # noqa: E402,F401  (registers recsys/ML queries)
import antidote_data_framework_spark.streaming  # noqa: E402,F401  (registers streaming queries)

SF0001 = "/root/testdata/sf0.001"

# Driver-facing registration order.  Round-1 lesson: the driver verifies
# only the FIRST 50 keys in insertion order — r01 left 35 SURVEY §2 keys
# without any correctness verdict because they registered late.  So the
# contract keys come first: 50 SQL-oracled §2 operators (strongest
# check), then the rows-only §2 operators, then the LLM-pipeline
# north-star extras, then everything else in registration order.
#
# ROTATION (r9 ADVICE): the §2 contract has 55 SQL-oracled keys (53 +
# O-15/O-41 law-boolean upgrades in r11) and the window holds 50, so
# membership rotates each round — every oracled key
# periodically gets EXTERNAL driver verification instead of three of
# them relying permanently on the committed sweep artifacts.
# r13 (per r12 VERDICT #4): O-4 q_join_inner, O-5 q_join_broadcast and
# O-13 q_agg_pricing_summary hit their 2-round out-tenure limit and
# rotate BACK IN via in-place slot swaps (every other key keeps its
# sweep position so the bench tracker compares like with like); the
# three longest-tenured never-rotated join keys rotate OUT to make
# room — O-7 q_join_outer, O-9 q_join_anti, O-11 q_join_theta_range
# (driver-hash-green r1-r12; their out-tenure clock starts now, return
# by r15).  O-8 q_join_semi / O-14 q_agg_distinct (rotated out r12)
# are in their first out-round and return by r14.  Every rotated-out
# key remains hash-verified by the sf0.01 AND sf0.1 sweeps, like every
# registered key.  Policy: no key stays outside the window for more
# than ~2 consecutive rounds.
CONTRACT_ORDER: list[str] = [
    # --- SQL-oracled SURVEY §2 keys (hash-checked by the driver) ---
    "q_scan_project_filter",      # O-1
    "q_source_csv_json_roundtrip",  # O-2 (SQL since r9)
    "q_sink_partitioned_parquet",   # O-3 (SQL since r9)
    "q_join_5way_star",           # O-6
    "q_join_inner",               # O-4 (rotated back IN, r13 — swapped
                                  #      into O-7's slot at its tenure
                                  #      limit)
    "q_als_rmse_gate",            # O-41 (rotated IN, r12 — first external
                                  #       hash check of the law-boolean
                                  #       oracle; swapped into O-8's slot)
    "q_join_broadcast",           # O-5 (rotated back IN, r13 — swapped
                                  #      into O-9's slot)
    "q_agg_pricing_summary",      # O-13 (rotated back IN, r13 — swapped
                                  #       into O-11's slot; also still
                                  #       run every round as entry())
    "q_join_asof",                # O-12
    "q_agg_approx_distinct",      # O-15 (rotated IN, r12 — first external
                                  #       hash check; swapped into O-14's
                                  #       slot)
    "q_agg_rollup",               # O-16
    "q_agg_cube_sets",            # O-17
    "q_agg_having_stats",         # O-18
    "q_agg_collect_sorted",       # O-19
    "q_window_ranking",           # O-20
    "q_window_running_frame",     # O-21
    "q_window_lead_lag",          # O-22
    "q_window_range_frame",       # O-23
    "q_topk_per_group",           # O-24
    "q_orderby_limit",            # O-25
    "q_set_intersect_except",     # O-27
    "q_scalar_string",            # O-28
    "q_scalar_datetime",          # O-29
    "q_ratings_from_lineitem",    # O-30
    "q_ratings_pivot",            # O-31
    "q_split_train_test",         # O-32
    "q_bias_baseline_rmse",       # O-33
    "q_polarization",             # O-34
    "q_fairness_value",           # O-35
    "q_fairness_under_over",      # O-37
    "q_fairness_parity",          # O-38
    "q_topk_recommendations",     # O-39
    "q_scalar_math_cond",         # O-44
    "q_json_extract",             # O-45
    "q_array_ops",                # O-46
    "q_map_from_json",            # O-47
    "q_window_tumbling",          # O-48
    "q_window_sliding",           # O-49
    "q_window_session",           # O-50
    "q_stream_tumbling_watermark",  # O-51 (SQL since r9)
    "q_stream_dedup_stateful",    # O-52 (SQL since r9)
    "q_text_wordcount",           # O-53
    "q_text_ngrams",              # O-54
    "q_dedup_exact",              # O-55
    "q_jaccard_block",            # O-56
    "q_cosine_topk",              # O-58
    "q_embed_centroids",          # O-60
    "q_join_cross",               # O-10 (rotated back in, r11)
    "q_set_union",                # O-26 (rotated back in, r11)
    "q_fairness_absolute",        # O-36 (rotated back in — slot 50)
    # --- SQL-oracled §2 keys rotated outside the window this round ---
    "q_join_outer",               # O-7 (rotated OUT r13 after r1-r12 green;
                                  #      returns by r15)
    "q_join_anti",                # O-9 (rotated OUT r13 after r1-r12 green;
                                  #      returns by r15)
    "q_join_theta_range",         # O-11 (rotated OUT r13 after r1-r12
                                  #       green; returns by r15)
    "q_join_semi",                # O-8 (rotated OUT r12 after r1-r11 green;
                                  #      1st round out, returns by r14)
    "q_agg_distinct",             # O-14 (rotated OUT r12 after r1-r11
                                  #       green; 1st round out, returns by
                                  #       r14)
    # --- rows-only SURVEY §2 keys (driver checks run + row count) ---
    "q_als_train_predict",        # O-40
    "q_antidote_step",            # O-42
    "q_antidote_loop",            # O-43
    "q_minhash_lsh",              # O-57
    "q_knn_lsh",                  # O-59
    "q_kmeans_labels",            # O-61
    "q_udf_surface",              # O-62
    # --- LLM-pipeline north-star extras (judge-graded first-class) ---
    "q_dedup_ngram_jaccard",
    "q_dedup_components",
    "q_simhash_neardup",
    "q_embed_neardup",
    "q_ivf_cosine_topk",
    "q_text_quality",
    "q_text_langid",
    "q_text_tokens",
    "q_doc_fingerprint",
    "q_corpus_curation",
    "q_multimodal_features",
    "q_multimodal_framesample",
    "q_als_recommend_topk",
    "q_antidote_step_fairness",
    "q_antidote_grad_sharded",
    "q_stream_custom_stateful",
    "q_stream_session_window",
    "q_stream_python_source",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_lakehouse_ingest",
    "q_text_repetition",
    "q_lakehouse_timetravel",
    "q_lakehouse_changefeed",
    "q_lakehouse_incremental_agg",
    "q_corpus_boilerplate_ngrams",
    "q_embed_quantize",
    "q_decontaminate_overlap",
    "q_text_chunk",
    "q_corpus_mixture",
]


def _ordered_keys() -> list[str]:
    missing = [k for k in CONTRACT_ORDER if k not in engine.QUERIES]
    assert not missing, f"CONTRACT_ORDER names unregistered queries: {missing}"
    rest = [k for k in engine.QUERIES if k not in set(CONTRACT_ORDER)]
    return CONTRACT_ORDER + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape pricing summary) on sf0.001."""
    return engine.QUERIES["q_agg_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: engine.QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    return {k: engine.ORACLE_SQL[k] for k in _ordered_keys() if k in engine.ORACLE_SQL}
