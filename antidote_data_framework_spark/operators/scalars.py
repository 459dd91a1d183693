"""Scalar-function operators — SURVEY.md §2B O-28/O-29/O-44..O-47.

All row-level expressions stay inside whole-stage codegen (built-in
``pyspark.sql.functions`` only — zero Python UDFs).  Engine-parity
notes per family:

- string/conditional/integer math: bit-exact across engines.
- transcendentals (ln/exp/pow) are libm-dependent in the last ulp —
  rounded to 4 decimals on BOTH sides.
- date arithmetic is aligned to DATE on both sides (Spark date_add
  returns DATE, DuckDB interval addition returns TIMESTAMP — we cast).
- array math is computed in DOUBLE on both sides (the embedding column
  is float32; accumulating in float would diverge between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_scalar_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_name)                        AS name_upper,
       LOWER(p_type)                        AS type_lower,
       SUBSTRING(p_name, 1, 5)              AS name_prefix,
       LENGTH(p_name)                       AS name_len,
       TRIM(p_name)                         AS name_trim,
       CONCAT(p_brand, '#', p_type)         AS brand_type,
       REPLACE(p_type, ' ', '_')            AS type_snake,
       (p_name LIKE '%a%')                  AS has_a,
       regexp_extract(p_name, '[a-z]+')     AS first_word,
       array_to_string(string_split(p_name, ' '), '|') AS name_tokens
FROM part
""",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over part: case, substring, length,
    trim, concat, replace, LIKE, POSIX regex extract, split."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        # split still exercised; joined back to a scalar string because
        # array cells crash the driver's canonicalizer (r01 red row)
        F.array_join(F.split("p_name", " "), "|").alias("name_tokens"),
    )


@spark_query(
    "q_scalar_datetime",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate)                                   AS order_year,
       MONTH(o_orderdate)                                  AS order_month,
       DAY(o_orderdate)                                    AS order_day,
       date_trunc('month', o_orderdate)                    AS month_start,
       date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_98,
       o_orderdate + INTERVAL 30 DAY                       AS due_date,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
""",
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function surface over o_orderdate (midnight-aligned
    timestamps): extraction, truncation, day diffs, interval add,
    last_day."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_98"),
        # DATE outputs are avoided engine-wide: pandas renders DuckDB DATE
        # as midnight timestamps, so both engines emit TIMESTAMP instead.
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@spark_query(
    "q_scalar_math_cond",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - l_quantity * 1000)   AS abs_diff,
       CAST(CEIL(l_extendedprice / 100) AS BIGINT)  AS price_ceil,
       CAST(FLOOR(l_discount * 100) AS BIGINT)      AS disc_pct,
       ROUND(l_extendedprice, 1)                  AS price_round,
       ROUND(SQRT(l_extendedprice), 4)            AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 4)          AS price_ln,
       ROUND(EXP(l_discount), 4)                  AS disc_exp,
       ROUND(POW(l_quantity, 2), 2)               AS qty_sq,
       l_orderkey % 7                             AS key_mod,
       CASE WHEN l_discount > 0.05 THEN 'high'
            WHEN l_discount > 0.02 THEN 'mid'
            ELSE 'low' END                        AS disc_band,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
       GREATEST(l_tax, l_discount)                AS max_rate,
       LEAST(l_tax, l_discount)                   AS min_rate
FROM lineitem
""",
)
def q_scalar_math_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional surface: abs/ceil/floor/round/sqrt/ln/exp/
    pow/mod, CASE WHEN, coalesce∘nullif, greatest/least.
    Transcendentals rounded to 4 decimals (libm parity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_diff"),
        F.ceil(F.col("l_extendedprice") / 100).alias("price_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@spark_query(
    "q_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       COUNT(*)            AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column, grouped rollup.
    get_json_object is a codegen'd JVM expression — at scale the JSON
    parse happens once per row inside the scan stage, no Python."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value"), "value"
        )
        .groupBy("k_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@spark_query(
    "q_array_ops",
    oracle="""
SELECT vec_id,
       len(embedding)                           AS n_dims,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
       array_to_string(list_transform(embedding[1:3],
             x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT) AS VARCHAR)), ',') AS first3,
       ROUND(SQRT(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
FROM embeddings
""",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: size, element access, slice, and
    an L2 norm via higher-order functions — the no-UDF pattern that
    keeps 100 TB of vectors inside codegen.  Squares accumulate in
    DOUBLE on both engines (float32 accumulation would diverge).

    The slice is emitted as a CSV of 1e-4-quantized integers, not an
    ARRAY (driver hasher cannot hash lists) and not a double→string
    cast (Spark renders small doubles in scientific notation, DuckDB
    decimal — integer quantization sidesteps both)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0)).alias(
            "first_val"
        ),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.round(x.cast("double") * 10000, 0).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("first3"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    )


@spark_query(
    "q_map_from_json",
    oracle="""
SELECT k.key                                                   AS prop_key,
       COUNT(*)                                                AS n_rows,
       CAST(SUM(CAST(json_extract_string(e.props, '$.' || k.key) AS INTEGER)) AS BIGINT) AS sum_int_value
FROM events e, UNNEST(json_keys(e.props)) AS k(key)
GROUP BY k.key
""",
)
def q_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props into MapType, explode entries, aggregate per key —
    the schema-on-read pattern for semi-structured event payloads."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("prop_key", "int_value")
    )
    return parsed.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("int_value").alias("sum_int_value"),
    )


@spark_query(
    "q_null_semantics",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'P') AS status_or_null,
         NULLIF(o_totalprice, 0.0)  AS price_or_null
  FROM orders
)
SELECT (status_or_null IS NOT DISTINCT FROM 'O')       AS nullsafe_is_open,
       (status_or_null IS DISTINCT FROM status_or_null) AS never_true,
       (status_or_null IS NULL)                         AS is_null,
       COUNT(*)                                         AS n,
       COUNT(status_or_null)                            AS n_nonnull,
       COUNT(*) - COUNT(status_or_null)                 AS n_null
FROM t
GROUP BY 1, 2, 3
""",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: null-safe equality (Spark <=> ==
    SQL IS NOT DISTINCT FROM), NULL-vs-NULL comparison, and the
    COUNT(col)-skips-nulls rule, over a derived nullable column
    (the fixtures themselves are fully non-null)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )
    return (
        t.groupBy(
            F.col("status_or_null").eqNullSafe(F.lit("O")).alias("nullsafe_is_open"),
            (~F.col("status_or_null").eqNullSafe(F.col("status_or_null"))).alias("never_true"),
            F.col("status_or_null").isNull().alias("is_null"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("status_or_null").alias("n_nonnull"),
            (F.count(F.lit(1)) - F.count("status_or_null")).alias("n_null"),
        )
    )


@spark_query(
    "q_json_variant",
    oracle="""
WITH ext AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       k % 10                                   AS k_bucket,
       CAST(COUNT(*) AS BIGINT)                 AS n,
       CAST(SUM(k) AS BIGINT)                   AS sum_k,
       CAST(MAX(k) AS BIGINT)                   AS max_k
FROM ext
WHERE k IS NOT NULL
GROUP BY event_type, k % 10
""",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` once into the binary VARIANT encoding, then typed
    ``variant_get`` extraction — unlike ``get_json_object``
    (q_json_extract, string re-parse per access), VARIANT parses each
    document ONCE and every later field access is a binary offset
    lookup, which is the 100 TB posture for wide semi-structured
    columns (and what Parquet variant shredding accelerates further).
    The oracle reads the same field relationally, so the whole
    VARIANT encode/decode path is hash-verified.
    """
    events = load_table(spark, sf_dir, "events")
    ext = events.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    ).filter(F.col("k").isNotNull())
    return ext.groupBy("event_type", (F.col("k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )
