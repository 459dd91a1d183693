"""Stats-gated join hints.

An explicit ``F.broadcast`` hint is honored unconditionally (it
bypasses autoBroadcastJoinThreshold), so hinting an SF-proportional
table is a build-side OOM at 100 TB — the r01 verdict anti-pattern
that tests/test_plans.py guards against by source-scanning every hint
site.  Iterative graph/ML state (one row per node) is SF-proportional
but MEASURED at plan-construction time, so the honest strategy is the
one a cost-based planner would pick: broadcast while the measured row
count is bounded, fall back to a shuffle join beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M single-key rows ≈ tens of MB serialized — comfortably under
# executor broadcast budgets while covering every realistic bench SF.
BROADCAST_ROW_LIMIT = 2_000_000


def broadcast_bounded(df: DataFrame, n_rows: int, limit: int = BROADCAST_ROW_LIMIT) -> DataFrame:
    """Hint ``F.broadcast`` on ``df`` iff the MEASURED ``n_rows`` is
    within ``limit``; otherwise ``df`` unchanged (planner picks)."""
    return F.broadcast(df) if n_rows <= limit else df


def broadcast_small(df: DataFrame, reason: str) -> DataFrame:
    """Hint ``F.broadcast`` on a frame that is STRUCTURALLY bounded —
    a 1-row scalar aggregate, a literal dim, a LIMIT-k head — i.e.
    whose size does not grow with SF.  ``reason`` is mandatory and
    must state the bound; tests/test_plans.py's broadcast lint bans
    raw ``F.broadcast`` everywhere except this module and
    operators/joins.py's structural dims, so every hint site in the
    engine either measures its row count (``broadcast_bounded``) or
    declares its bound here.  Hinting an SF-proportional table is a
    build-side OOM at 100 TB; routing through this chokepoint makes
    that mistake grep-able instead of regex-allowlisted."""
    if not reason:
        raise ValueError("broadcast_small requires a non-empty boundedness reason")
    return F.broadcast(df)


def widen_to_cores(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to core width iff its scan is NARROWER — the
    guard for CPU-bound Python stages (mapInPandas decode/hash) over
    small-file scans: one small parquet file arrives as 1-2 input
    splits, which serializes the Python work on 1-2 of N cores
    (measured: q_image_phash_neardup's whole 9x-scale wall was its
    decode stage running on 2 partitions).  At real scale the scan
    already has >= cores splits and this returns ``df`` unchanged, so
    the shuffle is paid exactly when it buys parallelism."""
    width = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(width) if df.rdd.getNumPartitions() < width else df
