"""Round-14 changes: the widen_to_cores work gate (r9 VERDICT #2) and
bench shutdown hygiene helpers (r9 VERDICT #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from antidote_data_framework_spark.functions.hints import (
    WIDEN_MIN_BYTES,
    widen_to_cores,
)
from antidote_data_framework_spark.sources import load_table


def test_widen_gate_skips_small_scans(spark, sf_dir):
    """Below the work gate the frame must come back UNCHANGED (same
    plan object — no exchange inserted): the r9 regression was a
    round-robin shuffle of binary payloads that cost more than the
    serial decode it parallelized."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("raw"))
    est = int(media._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert est < WIDEN_MIN_BYTES  # sf0.001/sf0.01 fixtures are tiny
    assert widen_to_cores(media) is media


def test_widen_min_bytes_zero_forces_partition_rule(spark, sf_dir):
    """min_bytes=0 restores the unconditional r9 behavior (phash /
    video-framesample call sites, whose Python work per byte is high
    enough to pay the exchange even on sub-MiB scans)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("raw"))
    width = spark.sparkContext.defaultParallelism
    widened = widen_to_cores(media, min_bytes=0)
    if media.rdd.getNumPartitions() < width:
        assert widened is not media
        assert widened.rdd.getNumPartitions() == width
    else:  # scan already wide — no-op either way
        assert widened is media


def test_widen_large_estimate_widens(spark):
    """Above the gate the partition rule applies: a narrow frame whose
    Catalyst estimate exceeds the threshold is repartitioned to core
    width (the 3x/9x scale fixtures and any real corpus)."""
    wide_text = spark.range(0, 200_000, 1, 1).select(
        "id", F.repeat(F.lit("x"), 200).alias("t")
    )
    est = int(
        wide_text._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert est >= WIDEN_MIN_BYTES
    width = spark.sparkContext.defaultParallelism
    assert widen_to_cores(wide_text).rdd.getNumPartitions() == width
