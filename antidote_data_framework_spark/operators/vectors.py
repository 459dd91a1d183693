"""Embedding / similarity-search operators — SURVEY.md §2B O-58/O-60.

Exact vector analytics with SQL oracles; the approximate scale paths
(LSH bucketing, KMeans) live in ``ml/`` as rows-only twins.  All dot
products / norms are higher-order array functions evaluated in the JVM
— at 100 TB the embedding column never crosses into Python.

Float discipline: the fixture embeddings are float32; every product is
cast to DOUBLE before accumulating so Spark and DuckDB agree bit-wise
(sequential left-to-right fold in both engines), then rounded to 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in DOUBLE via zip_with + aggregate — no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


@spark_query(
    "q_cosine_topk",
    oracle="""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id, e.label,
         list_sum(list_transform(list_zip(e.embedding, q.qe),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
            * SQRT(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
         AS cos_raw
  FROM embeddings e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, ROUND(cos_raw, 4) AS cosine_sim
FROM sims
ORDER BY cos_raw DESC, vec_id
LIMIT 5
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: exact top-5 cosine neighbors of vec_id=0.

    Brute-force baseline: broadcast the query vector, score every row
    inside codegen, TakeOrderedAndProject keeps only k per partition.
    This is the correctness oracle for the LSH approximate variant
    (q_knn_lsh) — same shape a 100 TB ANN pipeline validates against.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cosine(F.col("embedding"), F.col("qe")))
    )
    return (
        scored.orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cosine_sim"))
        .limit(5)
    )


@spark_query(
    "q_embed_centroids",
    oracle="""
SELECT label, CAST(p AS INT) AS pos,
       ROUND(AVG(CAST(embedding[CAST(p AS INT)] AS DOUBLE)), 4) + 0.0 AS centroid_val,
       COUNT(*) AS n_vectors
FROM embeddings, (SELECT UNNEST(range(1, 65)) AS p) ps
GROUP BY label, p
""",
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids: posexplode the embedding, average each
    component per (label, position), 1-based positions.

    The transpose-aggregate pattern: at scale this shuffles
    (label, pos, partial-sum) — 64×|labels| cells — instead of whole
    vectors, and reassembly back to array form is a sort_array over
    collected (pos, val) structs when needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "component")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            # + 0.0 normalizes IEEE -0.0 to +0.0 on both engines —
            # ROUND of a tiny negative average yields -0.0, which the
            # strict canonicalizer renders as "-0.0" != "0.0"
            (F.round(F.avg(F.col("component").cast("double")), 4) + F.lit(0.0)).alias(
                "centroid_val"
            ),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@spark_query(
    "q_embed_quantize",
    oracle="""
WITH q AS (
  SELECT label,
         list_min(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS vmin,
         list_max(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS vmax,
         list_transform(embedding, v -> CAST(v AS DOUBLE))           AS xd
  FROM embeddings
),
e AS (
  SELECT label,
         SQRT(list_sum(list_transform(xd, v ->
            POW(v - (vmin + COALESCE(ROUND((v - vmin) / NULLIF(vmax - vmin, 0) * 255), 0)
                            / 255 * (vmax - vmin)), 2)))
              / len(xd)) AS rmse
  FROM q
)
SELECT label,
       COUNT(*)            AS n_vectors,
       ROUND(AVG(rmse), 6) AS avg_rmse,
       ROUND(MAX(rmse), 6) AS max_rmse
FROM e GROUP BY label
""",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings with reconstruction
    error — the 4x storage-compression step of an embedding pipeline
    (serve quantized, rerank exact).  Per-vector min/max scaling:
    q = round((v - vmin)/(vmax - vmin) * 255), reconstruction
    v' = vmin + q/255*(vmax - vmin), per-vector RMSE pooled per label.

    Pure higher-order functions — quantize, reconstruct, and the error
    reduction all run inside codegen on the scan stage; the only
    shuffle is the per-label rollup.  A constant vector (vmax == vmin)
    reconstructs exactly (NULLIF guard -> zero error)."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    vmin, vmax = F.array_min(xd), F.array_max(xd)
    scale = F.nullif(vmax - vmin, F.lit(0.0))

    def sq_err(v):
        q = F.coalesce(F.round((v - vmin) / scale * 255), F.lit(0.0))
        recon = vmin + q / 255 * (vmax - vmin)
        return F.pow(v - recon, F.lit(2))

    rmse = F.sqrt(
        F.aggregate(
            F.transform(xd, sq_err), F.lit(0.0).cast("double"), lambda a, e: a + e
        )
        / F.size(xd)
    )
    return (
        emb.select("label", rmse.alias("rmse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("rmse"), 6).alias("avg_rmse"),
            F.round(F.max("rmse"), 6).alias("max_rmse"),
        )
    )
