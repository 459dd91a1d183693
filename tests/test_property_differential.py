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


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_window_functions_match_duckdb(spark, rows):
    """Window parity: ranking, running frames, and lag over a TOTAL
    order (rid breaks ties — duplicate rows make (i, x) orders
    engine-ambiguous, which is exactly the determinism rule the
    contract queries follow)."""
    pdf = pd.DataFrame(rows, columns=["k", "i", "x"])
    pdf["rid"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz_w")
    sql = """
        SELECT k, rid,
               ROW_NUMBER() OVER w_total                        AS rn,
               RANK()       OVER w_i                            AS rnk,
               DENSE_RANK() OVER w_i                            AS drnk,
               CAST(SUM(i) OVER (PARTITION BY k ORDER BY i, rid
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)        AS run_sum,
               LAG(i) OVER w_total                              AS prev_i,
               ROUND(AVG(x) OVER (PARTITION BY k ORDER BY i, rid
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) + 0.0 AS mov_avg
        FROM fuzz_w
        WINDOW w_total AS (PARTITION BY k ORDER BY i, rid),
               w_i     AS (PARTITION BY k ORDER BY i)
    """
    spark_out = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_w", pdf)
    duck_out = con.execute(sql).fetchdf()
    con.close()
    scols, srows = canon_rows(spark_out)
    dcols, drows = canon_rows(duck_out)
    assert scols == dcols
    assert srows == drows


two_tables_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=-2, max_value=2),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=-2, max_value=2),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=15,
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables=two_tables_strategy)
def test_joins_match_duckdb(spark, tables):
    """Join parity on duplicate-heavy keys: inner, left (null
    padding), and semi/anti shapes — the multiset compare catches
    wrong duplicate multiplicities that row counts alone would not."""
    la, lb = tables
    # explicit dtype + schema keep genuinely EMPTY tables testable —
    # a sentinel row would hide exactly the null-padding/anti-join
    # edge cases empty sides exist to expose
    pa = pd.DataFrame(la, columns=["k", "v"], dtype="int64")
    pb = pd.DataFrame(lb, columns=["k", "w"], dtype="int64")
    spark.createDataFrame(pa, "k BIGINT, v BIGINT").createOrReplaceTempView("fuzz_a")
    spark.createDataFrame(pb, "k BIGINT, w BIGINT").createOrReplaceTempView("fuzz_b")
    sql = """
        SELECT a.k, a.v, b.w, 'inner' AS tag
        FROM fuzz_a a JOIN fuzz_b b ON a.k = b.k
        UNION ALL
        SELECT a.k, a.v, b.w, 'left' AS tag
        FROM fuzz_a a LEFT JOIN fuzz_b b ON a.k = b.k
        UNION ALL
        SELECT a.k, a.v, NULL AS w, 'semi' AS tag
        FROM fuzz_a a WHERE EXISTS (SELECT 1 FROM fuzz_b b WHERE b.k = a.k)
        UNION ALL
        SELECT a.k, a.v, NULL AS w, 'anti' AS tag
        FROM fuzz_a a WHERE NOT EXISTS (SELECT 1 FROM fuzz_b b WHERE b.k = a.k)
    """
    spark_out = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_a", pa)
    con.register("fuzz_b", pb)
    duck_out = con.execute(sql).fetchdf()
    con.close()
    scols, srows = canon_rows(spark_out)
    dcols, drows = canon_rows(duck_out)
    assert scols == dcols
    assert srows == drows


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_order_statistics_match_duckdb(spark, rows):
    """Exact median / interpolated percentile / deterministic-mode
    parity on random frames — the q_agg_exact_median_mode assumptions
    fuzz-checked: interpolation arithmetic and min-tie-break modes
    must agree for any value multiset, including all-dupes and
    negative values."""
    pdf = pd.DataFrame(rows, columns=["k", "i", "x"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz_os")
    spark_sql = """
        SELECT k,
               ROUND(MEDIAN(i), 4) + 0.0 AS med_i,
               ROUND(PERCENTILE(i, 0.9), 4) + 0.0 AS p90_i,
               CAST(MIN(mode_cand) AS BIGINT) AS mode_i
        FROM (
          SELECT k, i,
                 CASE WHEN cnt = MAX(cnt) OVER (PARTITION BY k)
                      THEN i END AS mode_cand
          FROM (SELECT k, i, COUNT(*) OVER (PARTITION BY k, i) AS cnt
                FROM fuzz_os)
        )
        GROUP BY k
    """
    duck_sql = spark_sql.replace("PERCENTILE(i, 0.9)", "QUANTILE_CONT(i, 0.9)")
    spark_out = spark.sql(spark_sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_os", pdf)
    duck_out = con.execute(duck_sql).fetchdf()
    con.close()
    scols, srows = canon_rows(spark_out)
    dcols, drows = canon_rows(duck_out)
    assert scols == dcols
    assert srows == drows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_ewma_horner_fold_matches_duckdb(spark, rows):
    """The binary-decay EWMA's exact-integer Horner fold (windowed
    collect + fold) must agree cross-engine on any value stream —
    fuzzes the q_ewma_smooth construction with negative and extreme
    ints, where pow()-based EWMAs would drift."""
    pdf = pd.DataFrame(rows, columns=["k", "i", "x"])
    pdf = pdf.reset_index().rename(columns={"index": "rid"})
    pdf["c"] = pdf["i"] % 10_000  # bound so the shifted fold stays in int64
    sdf = spark.createDataFrame(pdf[["k", "rid", "c"]])
    sdf.createOrReplaceTempView("fuzz_ew")
    spark_sql = """
        SELECT k, rid,
               ROUND(
                 CAST(AGGREGATE(REVERSE(arr), CAST(0 AS BIGINT),
                                (acc, v) -> acc * 2 + v) AS DOUBLE)
                 / CAST((CAST(1 AS BIGINT) << SIZE(arr)) - 1 AS DOUBLE),
                 6) + 0.0 AS ewma
        FROM (
          SELECT k, rid,
                 COLLECT_LIST(c) OVER (PARTITION BY k ORDER BY rid
                   ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS arr
          FROM fuzz_ew
        )
    """
    duck_sql = """
        SELECT k, rid,
               ROUND(
                 CAST(CAST(list_sum(list_transform(range(1, len(arr)+1),
                        i -> arr[i] * (CAST(1 AS BIGINT) << (i-1)))) AS BIGINT) AS DOUBLE)
                 / CAST((CAST(1 AS BIGINT) << len(arr)) - 1 AS DOUBLE),
                 6) + 0.0 AS ewma
        FROM (
          SELECT k, rid,
                 list(c) OVER (PARTITION BY k ORDER BY rid
                   ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS arr
          FROM fuzz_ew
        )
    """
    spark_out = spark.sql(spark_sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_ew", pdf[["k", "rid", "c"]])
    duck_out = con.execute(duck_sql).fetchdf()
    con.close()
    scols, srows = canon_rows(spark_out)
    dcols, drows = canon_rows(duck_out)
    assert scols == dcols
    assert srows == drows
