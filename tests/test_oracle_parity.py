"""Differential oracle tests: every SQL-oracled query must hash-match
DuckDB at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from oracle_check import canon_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    sql = ORACLES.get(name)
    # Strict canon must succeed for EVERY registered query — the driver
    # canonicalizes rows-only results too (r01 lesson: array columns
    # crash its hasher even without an oracle).
    scols, srows = canon_rows(sdf)
    if sql is None:
        # rows-only contract: runs, well-formed, hashable result
        assert len(sdf.columns) > 0
        return
    ddf = duck.execute(sql).fetchdf()
    dcols, drows = canon_rows(ddf)
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows
