"""Negative controls for every oracle-pinned law boolean (r11 VERDICT
#1).

The r11 O-41 lesson, closed systematically: a law boolean the oracle
pins TRUE is only evidence if it CAN read FALSE.  O-41's rmse < 1.2
gate emitted passed=FALSE invisibly for ten rounds under rows-only
checking; the mirror-image failure — a bound that is accidentally
tautological (too loose, or comparing in the wrong direction) — would
sit invisibly TRUE forever.  Each test here perturbs the REAL
computation (biased sketch output, displaced GK values, tightened
threshold, replayed ingest batch, no-op vacuum, copy-on-write rewrite,
un-compacted DV snapshot) and asserts the production boolean flips
FALSE, proving the law is wired to the measured quantity and points
the right way.  The positive direction (boolean TRUE on the honest
path) is already pinned by the driver hash / sweep artifacts for every
one of these keys.

Inventory of pinned-TRUE booleans covered (grep 'TRUE AS' across the
package):
- q_agg_approx_distinct  parts_within_bound / orders_within_bound
- q_agg_approx_quantile  sketch_within_bound  (both interval ends)
- q_als_rmse_gate        passed / rmse_tight
- q_stream_lakehouse_ingest  exactly_once
- q_lakehouse_vacuum     files_reclaimed / expired_version_unreadable
- q_lakehouse_delete_vectors  data_files_untouched / compact_materializes
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidote_data_framework_spark.operators.aggregates import (
    _approx_distinct_frame,
    _approx_quantile_frame,
)
from antidote_data_framework_spark.operators.lakehouse_ops import (
    _compact_materializes,
    _data_files_untouched,
    _fresh_table_dir,
    _vacuum_booleans,
)
from antidote_data_framework_spark.sources.vtable import VersionedTable
from antidote_data_framework_spark.streaming.stream_queries import (
    _ingest_conservation,
)


# ---------------------------------------------------------------- O-15
def test_hll_bounds_flip_false_under_biased_estimate(spark, sf_dir):
    """Bias the HLL estimates far outside the 15% accuracy band: both
    bound booleans must read the biased sketch output and flip FALSE
    (the hashed exact counts stay correct — only the law reacts)."""
    [row] = _approx_distinct_frame(spark, sf_dir, est_bias=10**9).collect()
    assert row["parts_within_bound"] is False
    assert row["orders_within_bound"] is False
    assert row["n_parts_exact"] > 0  # exact leg untouched by the bias


# ---------------------------------------------------------------- O-?? (quantile)
@pytest.mark.parametrize("shift", [1e7, -1e7])
def test_gk_rank_interval_flips_false_under_displaced_sketch(
    spark, sf_dir, shift
):
    """Displace every GK sketch value by ±1e7 (far past the price
    domain): the displaced value's exact rank interval can no longer
    intersect any target ± slack window, so sketch_within_bound must
    flip FALSE in BOTH directions — +shift kills the hi-side conjunct,
    −shift the lo-side, proving each inequality points the right
    way.  The exact quantiles are computed from the un-shifted data
    and must stay intact."""
    rows = _approx_quantile_frame(spark, sf_dir, qs_shift=shift).collect()
    assert rows, "quantile frame returned no groups"
    for r in rows:
        assert r["sketch_within_bound"] is False, r
        assert r["p50_exact"] is not None and r["p50_exact"] > 0


def test_gk_rank_interval_true_at_zero_shift(spark, sf_dir):
    """Positive control in the same harness: the un-shifted law holds
    (also pinned by the driver hash, but asserting it here keeps the
    parametrized FALSE cases honest about what they perturb)."""
    for r in _approx_quantile_frame(spark, sf_dir, qs_shift=0.0).collect():
        assert r["sketch_within_bound"] is True, r


# ---------------------------------------------------------------- O-41
def test_als_gate_booleans_flip_false_under_tightened_thresholds(
    spark, sf_dir
):
    """Tighten both gate thresholds below the fixture's measured noise
    floor (rmse in [1.768, 1.819] across SFs and block grids): both
    booleans must flip FALSE, proving they read the measured rmse —
    an inverted or constant-folded comparison would stay TRUE."""
    from antidote_data_framework_spark.ml.als import _rmse_gate_row

    [row] = _rmse_gate_row(spark, sf_dir, loose=1.5, tight=1.5).collect()
    assert row["passed"] is False
    assert row["rmse_tight"] is False
    assert row["n_test"] > 0  # the census legs are untouched


# ------------------------------------------------- q_stream_lakehouse_ingest
def test_ingest_conservation_flips_false_on_replay_and_loss(spark):
    """Replay a batch under a FRESH txn id — the exact failure
    append_idempotent's commit-recorded id protects against — and the
    conservation law over the REAL table counts must flip FALSE; the
    same replay under the ORIGINAL id is a no-op and the law holds."""
    b0 = spark.range(0, 100).select(F.col("id").alias("event_id"))
    b1 = spark.range(100, 200).select(F.col("id").alias("event_id"))
    n_src = 200  # both source batches, disjoint ids

    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(b0)
    assert vt.append_idempotent(b1, "append-b1") is not None

    # replay under the SAME id: idempotent no-op, law holds
    assert vt.append_idempotent(b1, "append-b1") is None
    t = vt.read()
    assert _ingest_conservation(
        t.count(), t.select("event_id").distinct().count(), n_src
    ) is True

    # replay under a FRESH id: double-ingest, law flips
    assert vt.append_idempotent(b1, "append-b2") is not None
    t = vt.read()
    assert _ingest_conservation(
        t.count(), t.select("event_id").distinct().count(), n_src
    ) is False
    # and a dropped batch (source larger than table) also flips it
    assert _ingest_conservation(n_src, n_src, n_src + 1) is False


# ------------------------------------------------------- q_lakehouse_vacuum
def test_vacuum_booleans_flip_false_on_noop_vacuum(spark):
    """Vacuum with retain_last beyond the version count: nothing is
    reclaimed and v0 stays readable — both booleans must flip FALSE
    from the same audit + read-probe path the operator uses."""
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(base)
    vt.merge(
        spark.range(0, 10).select(F.col("id").alias("k")),
        "k",
        {"val": F.col("val") + 1},
    )
    audit = vt.vacuum(retain_last=99, grace_seconds=0.0)
    reclaimed, unreadable = _vacuum_booleans(vt, audit, 0)
    assert reclaimed is False
    assert unreadable is False


# ----------------------------------------------- q_lakehouse_delete_vectors
def test_dv_booleans_flip_false_on_rewrite_and_uncompacted_dv(spark):
    """data_files_untouched must flip FALSE after a copy-on-write
    MERGE (which rewrites every data file), and compact_materializes
    must flip FALSE when pointed at a version that still carries
    delete vectors — both through the operators' own manifest
    helpers."""
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("val")
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(base)
    files_v0 = set(vt._read_manifest(0)["files"])

    # DV delete keeps files identical (positive control)…
    vt.delete_where(F.col("val") == 3)
    assert _data_files_untouched(vt, files_v0, [1]) is True
    n_after_dv = vt.read(1).count()
    # …but v1 still carries DVs, so "compacted" it is not:
    assert _compact_materializes(vt, 1, n_after_dv) is False

    # copy-on-write MERGE rewrites the files → untouched flips FALSE
    vt.merge(
        spark.range(0, 5).select(F.col("id").alias("k")),
        "k",
        {"val": F.lit(99)},
    )
    assert _data_files_untouched(vt, files_v0, [2]) is False

    # real compaction restores the law (positive control)
    vt.compact()
    assert _compact_materializes(vt, vt.latest_version(), vt.read().count()) is True
