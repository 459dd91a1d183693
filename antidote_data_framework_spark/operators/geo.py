"""Geospatial blocking operators — grid-cell-blocked nearest-neighbor
joins, the spatial member of the engine's "never all-pairs" family
(MinHash bands for text, sign/IVF cells for embeddings, grid cells for
coordinates).

Coordinates are derived DETERMINISTICALLY from entity keys (integer
modulo laws → two-decimal degrees), because the TPC-H-ish fixtures
carry no native geography; the operator's plan shape — cell assignment
in codegen, neighbor replication of the SMALL side only, equi-join on
cell, exact refine — is exactly what a real lat/lon column gets.

Distance discipline: ranking uses squared DEGREE distance (pure
polynomial double arithmetic — identical IEEE results in any engine),
not haversine: libm trig (sin/cos/atan2) is not ulp-identical between
the JVM and DuckDB's C runtime, so a haversine tie at the 4-dp
boundary could flip engines.  For nearest-neighbor RANKING within a
3x3 cell neighborhood the squared-degree metric picks the same winner
as haversine away from the poles; production code needing true meters
applies haversine AFTER the winner is chosen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table

CELL_DEG = 5  # grid cell edge, degrees


def _lat(key: Column, mult: int) -> Column:
    return -60 + ((key * mult) % 12000) / F.lit(100.0)


def _lon(key: Column, mult: int) -> Column:
    return -180 + ((key * mult) % 36000) / F.lit(100.0)


@spark_query(
    "q_geo_grid_knn",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey,
         -60 + (c_custkey * 7919 % 12000) / 100.0 AS lat,
         -180 + (c_custkey * 104729 % 36000) / 100.0 AS lon
  FROM customer
),
supp AS (
  SELECT s_suppkey,
         -60 + (s_suppkey * 6271 % 12000) / 100.0 AS lat,
         -180 + (s_suppkey * 99991 % 36000) / 100.0 AS lon
  FROM supplier
),
supp_rep AS (
  SELECT s.s_suppkey, s.lat, s.lon,
         CAST(FLOOR(s.lat / {CELL_DEG}) + dx.v AS BIGINT) AS cell_lat,
         CAST(FLOOR(s.lon / {CELL_DEG}) + dy.v AS BIGINT) AS cell_lon
  FROM supp s
  CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
  CROSS JOIN (VALUES (-1), (0), (1)) dy(v)
),
cand AS (
  SELECT c.c_custkey, s.s_suppkey,
         (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY (c.lat - s.lat) * (c.lat - s.lat)
                      + (c.lon - s.lon) * (c.lon - s.lon),
                    s.s_suppkey) AS rk
  FROM cust c
  JOIN supp_rep s
    ON CAST(FLOOR(c.lat / {CELL_DEG}) AS BIGINT) = s.cell_lat
   AND CAST(FLOOR(c.lon / {CELL_DEG}) AS BIGINT) = s.cell_lon
)
SELECT c.c_custkey,
       ROUND(c.lat, 2) AS c_lat,
       ROUND(c.lon, 2) AS c_lon,
       n.s_suppkey AS nearest_suppkey,
       ROUND(n.d2, 4) AS dist2_deg
FROM cust c
LEFT JOIN (SELECT * FROM cand WHERE rk = 1) n USING (c_custkey)
""",
)
def q_geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial nearest-neighbor join: every customer
    finds its nearest supplier among the 3x3 grid-cell neighborhood
    around its own 5-degree cell (NULL when no supplier is that
    close — an honest "no coverage" answer, not a global scan).

    Shape: cell ids are floor-division codegen on both scans; the
    SMALL side (suppliers) replicates 9x with its neighbor offsets —
    replicating the small relation instead of probing 9 cells from the
    big side keeps the big side's shuffle key a single cell — then one
    equi-join on (cell_lat, cell_lon), an exact squared-degree refine,
    and a per-customer row_number pick with suppkey tie-break.

    At 100 TB this is the standard spatial-join recipe: the join is a
    plain hash join on cell ids (broadcast when the replicated small
    side fits, shuffle otherwise); cell size trades replication factor
    against candidate fan-in, and coastal/urban skew is handled like
    any hot key — split hot cells one level finer (quadtree descent),
    which composes because cell assignment is stateless codegen.
    All-pairs distance never happens; each customer scores only its
    neighborhood's suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey"), 7919).alias("lat"),
        _lon(F.col("c_custkey"), 104729).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat(F.col("s_suppkey"), 6271).alias("lat"),
        _lon(F.col("s_suppkey"), 99991).alias("lon"),
    )
    offsets = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    supp_rep = supp.crossJoin(bcast(offsets, "literal offset dim (9 rows)")).select(
        "s_suppkey",
        "lat",
        "lon",
        (F.floor(F.col("lat") / CELL_DEG) + F.col("dx")).alias("cell_lat"),
        (F.floor(F.col("lon") / CELL_DEG) + F.col("dy")).alias("cell_lon"),
    )
    d2 = (F.col("c.lat") - F.col("s.lat")) * (F.col("c.lat") - F.col("s.lat")) + (
        F.col("c.lon") - F.col("s.lon")
    ) * (F.col("c.lon") - F.col("s.lon"))
    cand = (
        cust.alias("c")
        .join(
            # no forced broadcast: supp_rep is SF-proportional (9x the
            # supplier dim) — AQE broadcasts it while it fits and falls
            # back to a shuffle hash join on the cell keys beyond that.
            supp_rep.alias("s"),
            (F.floor(F.col("c.lat") / CELL_DEG) == F.col("s.cell_lat"))
            & (F.floor(F.col("c.lon") / CELL_DEG) == F.col("s.cell_lon")),
        )
        .select(
            F.col("c.c_custkey").alias("c_custkey"),
            F.col("s.s_suppkey").alias("s_suppkey"),
            d2.alias("d2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return cust.join(cand, "c_custkey", "left").select(
        "c_custkey",
        F.round("lat", 2).alias("c_lat"),
        F.round("lon", 2).alias("c_lon"),
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.round("d2", 4).alias("dist2_deg"),
    )
