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


def spark_query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB over the
    pre-registered fixture views (region nation customer supplier part
    orders lineitem events documents embeddings).  Omit it only for
    genuinely non-SQL-expressible operators (iterative ML, streaming,
    sketches) — those get a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE_SQL[key] = oracle.strip()
        return fn

    return deco
