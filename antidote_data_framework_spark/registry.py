"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here with
``@spark_query(key, oracle=...)``.  ``__spark_entry__.py`` exposes the
two dicts verbatim to the driver, which hash-matches each SQL-oracled
query against DuckDB at sf0.01 (rows-only check when ``oracle=None``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}
# Keys whose result set is LEGITIMATELY empty on the fixtures (an
# invariant-check query whose pass state IS zero violations, say).
# Everything else returning 0 rows is treated as a vacuous pass by the
# zero-row lint in oracle_check.py (VERDICT r6 #2): empty==empty
# hash-matches verify nothing, and that is exactly how three dead
# operators shipped green for three rounds.
EXPECTED_EMPTY: set[str] = set()


def spark_query(
    key: str, oracle: Optional[str] = None, expected_empty: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB over the
    pre-registered fixture views (region nation customer supplier part
    orders lineitem events documents embeddings).  Omit it only for
    genuinely non-SQL-expressible operators (iterative ML, streaming,
    sketches) — those get a weaker rows-only check.

    ``expected_empty=True`` declares that ZERO result rows on the
    fixtures is the correct, meaningful answer; without it the sweep
    fails any query whose Spark result is empty (vacuous-pass lint).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE_SQL[key] = oracle.strip()
        if expected_empty:
            EXPECTED_EMPTY.add(key)
        return fn

    return deco
