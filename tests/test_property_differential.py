"""Property-based differential testing (hypothesis): random small
tables pushed through the same aggregation in Spark and DuckDB must
canon-match.  This fuzzes the engine-parity assumptions the fixed
fixtures can't cover: negative values, empty groups, duplicate keys,
extreme ints."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_check import canon_rows

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),  # group key (few groups, collisions)
        st.integers(min_value=-(10**9), max_value=10**9),  # int measure
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),  # double measure
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_groupby_aggregates_match_duckdb(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "i", "x"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz_t")
    # integer aggregates are exact; double aggregates rounded per the
    # engine-wide determinism rules (4 dp on both sides).  Two extra
    # rules the fuzzer itself re-discovered (SURVEY §2 rule 2):
    # - CAST(SUM(int)) — DuckDB types it HUGEINT, which fetchdf lowers
    #   to float64 ("0.0" vs Spark's BIGINT "0").
    # - `+ 0.0` after every double aggregate — DuckDB preserves -0.0
    #   through ROUND/MIN where Spark normalizes it; IEEE 754 says
    #   -0.0 + 0.0 = +0.0 in both engines, so this pins the sign.
    sql = """
        SELECT k,
               COUNT(*)                  AS n,
               CAST(SUM(i) AS BIGINT)    AS sum_i,
               MIN(i)                    AS min_i,
               MAX(i)                    AS max_i,
               ROUND(AVG(x), 4) + 0.0    AS avg_x,
               ROUND(MIN(x), 4) + 0.0    AS min_x,
               ROUND(MAX(x), 4) + 0.0    AS max_x
        FROM fuzz_t GROUP BY k
    """
    spark_out = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_t", pdf)
    duck_out = con.execute(sql).fetchdf()
    con.close()
    scols, srows = canon_rows(spark_out)
    dcols, drows = canon_rows(duck_out)
    assert scols == dcols
    assert srows == drows
