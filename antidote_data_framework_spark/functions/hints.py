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
