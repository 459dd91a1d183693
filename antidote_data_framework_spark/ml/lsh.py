"""Sketch-based scale twins — SURVEY.md §2B O-57/O-59/O-61.

These are the 100 TB paths for the exact operators that have SQL
oracles (q_jaccard_block, q_cosine_topk): MinHash LSH turns the
within-block O(N²) self-join into a band-bucket join; random-
projection LSH turns brute-force ANN into bucket probing; KMeans is
the embedding-space partitioner for IVF-style search.  All rows-only:
sketches are implementation-specific.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
    NGram,
    Tokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table


@spark_query("q_minhash_lsh")  # rows-only: sketch-specific estimates
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup join — the scale path for q_jaccard_block.

    Pipeline: tokenize → 2-shingles → binary HashingTF (shingle-set
    vectors by feature hashing — no vocabulary fit, so featurization
    is a single pass at any corpus size) → MinHash signatures →
    approxSimilarityJoin (band-bucket equi-join under the hood, so
    candidate generation is a shuffle on bucket keys, never all
    pairs).

    Shingling is load-bearing at scale: over a small word vocabulary,
    unigram token sets collide so heavily that MinHash buckets go
    quadratic (measured: 950 s at sf0.1); 2-shingles square the
    effective vocabulary, making signatures discriminative and bucket
    sizes ~constant."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = Tokenizer(inputCol="text", outputCol="words")
    words = tok.transform(docs)
    shingler = NGram(n=2, inputCol="words", outputCol="shingles")
    shingled = shingler.transform(words).filter(F.size("shingles") > 0)
    hasher = HashingTF(
        inputCol="shingles", outputCol="features", binary=True, numFeatures=1 << 18
    )
    feats = hasher.transform(shingled)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 4).alias("jaccard_dist"),
        )
    )


@spark_query("q_knn_lsh")  # rows-only: approximate neighbors
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors of vec_id=0 via random-projection
    LSH (Euclidean) — the ANN twin of the exact q_cosine_topk.  At
    scale, bucketLength and numHashTables trade recall for probe
    fan-out; approxNearestNeighbors probes only matching buckets."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = brp.fit(emb)
    key = emb.filter(F.col("vec_id") == 0).first()["features"]
    neighbors = model.approxNearestNeighbors(
        emb.filter(F.col("vec_id") != 0), key, 5, distCol="euclidean_dist"
    )
    return neighbors.select(
        "vec_id", "label", F.round("euclidean_dist", 4).alias("euclidean_dist")
    )


@spark_query("q_kmeans_labels")  # rows-only: cluster ids are run-relative
def q_kmeans_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans (k=10, seed 42) over the embeddings — the IVF partition
    step for vector search and the sanity check that the 10 planted
    label clusters are recoverable.  Emits cluster sizes ranked
    descending (ids are run-relative, sizes are the stable part)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=10, seed=42, featuresCol="features", predictionCol="cluster")
    model = km.fit(emb)
    sizes = (
        model.transform(emb)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy(F.desc("n_vectors"), F.asc("cluster"))
        .select("n_vectors")
    )
    return sizes.withColumn(
        "size_rank", F.row_number().over(Window.orderBy(F.desc("n_vectors")))
    )


@spark_query("q_ivf_cosine_topk")  # rows-only: approximate (probed) search
def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbors: KMeans (k=16) as the
    coarse quantizer, then exact cosine only inside the nprobe=6
    clusters nearest to the query — the third leg of the similarity
    stack (exact q_cosine_topk / LSH q_knn_lsh / IVF here).

    Scale shape: the partition-by-cluster layout means a query touches
    nprobe/k of the corpus (~38% here; ~1% in production with k=4096),
    and the probed exact search is the same broadcast-scored plan as
    the exact operator.  Centroid scoring is driver-side numpy over a
    k×dim array — small by construction, like the antidote state.

    Recall caveat (measured): the fixture embeddings are near-
    isotropic random vectors, so recall ~= probed fraction (0.4@38%
    probed) — the information-theoretic floor for structureless data.
    On real embedding manifolds IVF recall concentrates because true
    neighbors share cells; the operator's plan is unchanged."""
    import numpy as np

    from ..operators.vectors import dot_product

    # L2-normalize BEFORE clustering: on unit vectors Euclidean
    # distance is monotone in cosine, so the KMeans cells align with
    # cosine neighborhoods (without this, measured recall@5 vs the
    # exact search dropped to 0.2).
    raw = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(dot_product(F.col("embedding"), F.col("embedding")))
    emb = raw.withColumn(
        "features",
        array_to_vector(
            F.transform(F.col("embedding"), lambda x: x.cast("double") / norm)
        ),
    )
    km = KMeans(k=16, seed=42, featuresCol="features", predictionCol="cluster")
    model = km.fit(emb)
    assigned = model.transform(emb)

    query = emb.filter(F.col("vec_id") == 0).first()
    q = np.array(query["features"].toArray(), dtype=np.float64)
    centers = np.asarray(model.clusterCenters(), dtype=np.float64)
    sims = (centers @ q) / (
        np.linalg.norm(centers, axis=1) * np.linalg.norm(q) + 1e-12
    )
    probe = [int(i) for i in np.argsort(-sims)[:6]]

    from ..operators.vectors import cosine

    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        assigned.filter(F.col("cluster").isin(probe) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(qdf))
        .withColumn("cos_raw", cosine(F.col("embedding"), F.col("qe")))
    )
    return (
        scored.orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cosine_sim"))
        .limit(5)
    )
