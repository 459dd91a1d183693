"""Distributed second-moment statistics and PCA over the embedding
column — the dimensionality-reduction stage of an embedding pipeline
(whitening, compression before ANN indexing, drift dashboards).

Three operators, one architecture: the Gram matrix ``X^T X`` is the
ONLY thing that touches every row, and it reduces to d x d numbers —
so it is computed distributed (once as pure SQL exprs with exact
DECIMAL sums for the hash-matched contract, once as an Arrow-batched
``mapInPandas`` partial-aggregation for the full-dimension scale path),
and the eigen-decomposition happens on the driver over a d x d = 64 x 64
matrix (32 KiB — bounded by construction, NOT by data size; the same
driver-side-small-state rule as ml/antidote.py).  Projections then go
back through codegen as higher-order-function dot products.

The reference has no PCA surface; this extends the engine's embedding
toolkit (SURVEY §2C north star) alongside q_embed_centroids /
q_cosine_topk / q_embed_quantize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table

_GRAM_DIMS = 8  # SQL-oracled slice; the mapInPandas path does all 64


@spark_query(
    "q_embed_gram_sql",
    oracle=f"""
WITH e AS (
  SELECT vec_id, u.i - 1 AS i, u.val
  FROM embeddings,
       LATERAL (SELECT UNNEST(embedding[1:{_GRAM_DIMS}]) AS val,
                       generate_subscripts(embedding[1:{_GRAM_DIMS}], 1) AS i) u
)
SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(CAST(a.val AS DOUBLE) * CAST(b.val AS DOUBLE)
                           AS DECIMAL(28,12))), 6) AS DOUBLE) AS gram
FROM e a JOIN e b USING (vec_id)
GROUP BY a.i, b.i
ORDER BY i, j
""",
)
def q_embed_gram_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix (un-centered second moment) of the first 8 embedding
    dimensions, as pure codegen with EXACT decimal accumulation.

    Determinism is the whole trick: a float32 x float32 product in
    DOUBLE is exact (24-bit x 24-bit < 53 bits), and casting that
    double to DECIMAL(28,12) is the same correctly-rounded value in
    both engines — so the SUM is an exact decimal total, independent
    of partition/summation order.  This is the money.py discipline
    applied to ML statistics: distributed float reductions hash-match
    an oracle, which plain double sums cannot.

    Plan shape: each row expands to d^2 = 64 (i, j, product) tuples via
    two chained ``posexplode`` generators (NO self-join — the oracle's
    relational unnest-join formulation would shuffle the corpus
    twice); one groupBy reduce brings d^2 rows to the driver scale.
    Two flat generators beat the earlier nested-lambda
    transform-of-transform-of-struct formulation: identical row
    counts, but the generated code is a fraction of the size, so
    whole-stage compilation is fast AND survives codegen-cache
    pressure in long sessions (the r5 bench saw the big-lambda
    version recompile every sweep, 0.67 s -> 3.28 s).  At 100 TB with
    d = 64 use the mapInPandas twin (q_embed_gram) — same reduce, 64x
    fewer intermediate rows because each Arrow batch pre-multiplies
    locally."""
    emb = load_table(spark, sf_dir, "embeddings")
    e8 = emb.select(F.slice("embedding", 1, _GRAM_DIMS).alias("e8"))
    left = e8.select(
        F.posexplode("e8").alias("i", "x"), F.col("e8").alias("e8r")
    )
    pairs = left.select("i", "x", F.posexplode("e8r").alias("j", "y")).select(
        "i",
        "j",
        (F.col("x").cast("double") * F.col("y").cast("double")).alias("prod"),
    )
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("prod").cast("decimal(28,12)")), 6)
            .cast("double")
            .alias("gram"),
        )
        .orderBy("i", "j")
    )


def _gram_partials(dims: int):
    """mapInPandas kernel: per-Arrow-batch partial X^T X (float64) +
    row count, emitted as d^2 rows.  The classic distributed gram
    pattern: all O(n d^2) multiply-adds happen inside vectorized numpy
    on executors; only d^2 numbers per batch cross the wire."""

    def fn(batches):
        for pdf in batches:
            X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)[:, :dims]
            G = X.T @ X
            ii, jj = np.meshgrid(np.arange(dims), np.arange(dims), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "partial": G.ravel(),
                    "n_rows": np.full(dims * dims, len(pdf), dtype=np.int64),
                }
            )

    return fn


def gram_df(spark: SparkSession, sf_dir: str, dims: int = 64) -> DataFrame:
    """Full-dimension distributed Gram matrix via Arrow-batched partial
    aggregation — the 100 TB path (see q_embed_gram_sql docstring)."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    partials = emb.mapInPandas(
        _gram_partials(dims), schema="i INT, j INT, partial DOUBLE, n_rows BIGINT"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("partial").alias("gram"),
        F.sum("n_rows").alias("n"),
    )


@spark_query("q_embed_gram")  # rows-only: float64 partial sums are
# summation-order-dependent in the last ulps; golden-tested vs numpy
# with tolerance instead of hash-matched (the decimal-exact SQL twin
# q_embed_gram_sql carries the hash-match evidence)
def q_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 64x64 Gram matrix via mapInPandas partial aggregation."""
    g = gram_df(spark, sf_dir, 64)
    return g.select(
        "i", "j", "n", F.round("gram", 4).alias("gram")
    ).orderBy("i", "j")


def _principal_axes(spark: SparkSession, sf_dir: str, k: int = 2) -> np.ndarray:
    """Top-k principal axes from the distributed Gram + mean.

    Driver-side state is d x d = 64 x 64 (32 KiB) + a d-vector —
    bounded by the embedding dimension, never by the row count.  Sign
    is fixed per eigenvector (largest-|component| made positive) so
    the projection is reproducible across eigensolver builds."""
    d = 64
    g = gram_df(spark, sf_dir, d).collect()
    n = g[0]["n"]
    G = np.zeros((d, d))
    for row in g:
        G[row["i"], row["j"]] = row["gram"]
    mean = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.posexplode("embedding").alias("i", "x")
        )
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    mu = np.zeros(d)
    for row in mean:
        mu[row["i"]] = row["m"]
    cov = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    axes = vecs[:, order].T  # k x d
    for a in axes:
        if a[np.argmax(np.abs(a))] < 0:
            a *= -1.0
    return axes


@spark_query("q_pca_project")  # rows-only: eigenvectors of float-summed
# covariance wobble in the last ulps; golden-tested with tolerance
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection: every embedding onto the top-2 principal axes of
    the corpus covariance, with its class label for downstream plots.

    Two distributed passes (gram + mean — could be fused into one
    aggregation; kept separate for clarity since both are group-level
    reductions), one 64x64 driver eigh, then a codegen-only projection:
    the axes ship as literal arrays and the dot product is
    zip_with + aggregate — no Python touches the full table."""
    axes = _principal_axes(spark, sf_dir, k=2)
    emb = load_table(spark, sf_dir, "embeddings")

    def dot_with(vec: np.ndarray):
        lit = F.array(*[F.lit(float(v)) for v in vec])
        return F.aggregate(
            F.zip_with(F.col("embedding"), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select(
        "vec_id",
        "label",
        F.round(dot_with(axes[0]), 3).alias("pc1"),
        F.round(dot_with(axes[1]), 3).alias("pc2"),
    ).orderBy("vec_id")
