"""Scale-path dedup operators — north-star mandated (BASELINE.json:
"dedup" as a first-class component; complements q_dedup_exact /
q_jaccard_block / q_minhash_lsh).

- SimHash: a 16-bit rotation-tolerant signature built entirely from
  higher-order array functions (no UDF, no explode blow-up), with
  banded candidate generation — the linear-time near-dup path.
- Embedding-cosine near-dup: semantic duplicates via exact cosine
  within label blocks (SQL-oracled; the LSH twin is q_knn_lsh).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table
from .vectors import cosine

# 60-bit signature in 4 bands of 15 bits: banding guarantees any pair
# with hamming <= 3 collides in >= 1 band, and 2^15 band values keep
# expected collisions ~ n²/32768 per band — linear-ish at sf0.1 (50k
# docs -> ~300k candidates), instead of the all-pairs O(n²).
SIMHASH_BITS = 60
N_BANDS = 4
BAND_WIDTH = SIMHASH_BITS // N_BANDS


def _simhash(hashes: Column) -> Column:
    """SimHash of a per-token 64-bit hash array: per bit j, sum ±1
    votes of bit j over all tokens; signature bit j = (vote > 0).

    Pure JVM expressions in a SINGLE traversal of the token array
    (r3 VERDICT: the previous form ran 60 sequential ``F.aggregate``
    passes — O(60·tokens) array scans and a 60× larger codegen tree;
    this one carries all 60 vote counters through one ``F.aggregate``
    whose accumulator is an ARRAY<LONG>).  Zero Python, no row
    explosion, no shuffle."""
    bit_idx = F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        # per token: acc[j] += (bit j of h) ? +1 : -1, for all j at once
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bit_idx, lambda j: (F.getbit(h, j) * 2 - 1).cast("long")),
            lambda a, v: a + v,
        ),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    sig = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # null token array -> signature 0 (the pre-rewrite behavior: a null
    # vote never satisfied `vote > 0`, so every bit stayed 0)
    return F.coalesce(sig, F.lit(0).cast("long"))


@spark_query("q_simhash_neardup")  # rows-only: engine-specific hash basis
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: signature → 4 bands of 15 bits →
    band-bucket equi-join (LSH banding: any pair with hamming <= 3
    collides in >= 1 band) → exact Hamming verify <= 3.

    The banded join is the 100 TB move: candidates come from 4
    hash-partitioned equi-joins on (band_id, band_value) instead of an
    all-pairs comparison."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.withColumn(
        "tok_hashes",
        F.transform(F.split("text", " "), lambda t: F.xxhash64(t)),
    )
    sigs = hashed.select("doc_id", _simhash(F.col("tok_hashes")).alias("sig"))
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        (
                            F.shiftrightunsigned("sig", k * BAND_WIDTH)
                            % (1 << BAND_WIDTH)
                        ).alias("band_val"),
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_val")
    # Materialize the banded signature table ONCE (n_docs×N_BANDS tiny
    # rows): a lazy self-join would re-run the scan+tokenize+signature
    # pipeline for BOTH sides — measured 2× the whole query's cost at
    # sf0.1.  At cluster scale this is a persisted/temp table.
    banded = banded.localCheckpoint()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        # verify BEFORE dedup: banding makes the same true pair collide
        # in several bands, but the hamming filter kills the (huge,
        # skewed-bucket) false-candidate mass first, so distinct sees
        # thousands of rows, not hundreds of thousands
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


@spark_query(
    "q_embed_neardup",
    oracle="""
WITH sub AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 < 2
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
            * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
         AS cos_raw
  FROM sub a JOIN sub b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label, ROUND(cos_raw, 4) AS cosine_sim
FROM pairs WHERE cos_raw >= 0.15
""",
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates: exact cosine >= 0.15 between
    vectors of the same label block, on a deterministic 20% sample.

    Label blocking bounds the pair count (the IVF idea: only compare
    within a coarse partition); the deterministic modulo sample keeps
    the exact O(block²) verify affordable at any SF.  At 100 TB the
    block key comes from q_kmeans_labels instead of a given label."""
    sub = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 < 2)
        .select("vec_id", "label", "embedding")
    )
    a, b = sub.alias("a"), sub.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.label").alias("label"),
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_raw"),
    )
    return (
        pairs.filter(F.col("cos_raw") >= 0.15)
        .select("vec_a", "vec_b", "label", F.round("cos_raw", 4).alias("cosine_sim"))
    )


# Sign-bit coarse clustering for semantic dedup: 8 leading dims -> 256
# deterministic buckets.  Unlike learned KMeans cells this is
# hash-matchable cross-engine, and the blocking guarantee is the same
# shape: pairs are only scored within a bucket.
SEMDEDUP_SIGN_DIMS = 8


@spark_query(
    "q_semantic_dedup",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(range(1, {SEMDEDUP_SIGN_DIMS + 1}),
           i -> CASE WHEN embedding[i] >= 0 THEN 1 << (i - 1) ELSE 0 END))
           AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS keep_cand, b.vec_id AS vec_id
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
           * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
        >= 0.15
),
kmin AS (
  SELECT vec_id, MIN(keep_cand) AS min_neighbor,
         CAST(COUNT(*) AS BIGINT) AS n_smaller_neighbors
  FROM pairs GROUP BY vec_id
)
SELECT v.vec_id, CAST(v.bucket AS BIGINT) AS bucket,
       COALESCE(k.min_neighbor, v.vec_id) AS keeper_id,
       (k.min_neighbor IS NULL) AS is_kept,
       COALESCE(k.n_smaller_neighbors, 0) AS n_smaller_neighbors
FROM v LEFT JOIN kmin k ON v.vec_id = k.vec_id
""",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023):
    coarse-cluster the embedding space, score exact cosine ONLY within
    a cluster, and keep one representative per near-duplicate
    neighborhood (the smallest vec_id; every other member points at
    its keeper).  This is the embedding-space analogue of document
    dedup — it removes *semantically* redundant training points that
    no lexical dedup can see.

    The coarse clusters here are the 8 leading sign bits (256
    deterministic cells) so the whole operator — blocking included —
    hash-matches DuckDB; in production the bucket column comes from
    q_kmeans_labels centroids instead, and the within-cell pass is
    unchanged.  Keeper election is ONE-HOP (min smaller-id cosine
    neighbor), the per-cell greedy SemDeDup uses; transitive-closure
    canonicalization on top of these edges is exactly
    q_dedup_components.

    Shape: bucket assignment is a per-row array fold in codegen on the
    scan; the self-join shuffles (bucket, id, vec) once on an 8-bit
    key; within-cell pairs are the only cosine evaluations (cells
    bound the quadratic term: n²/256 in expectation for isotropic
    data).  The keeper rollup and the left-join back both reuse the
    vec_id hash partitioning.  At 100 TB: cells come from a trained
    coarse quantizer (IVF), hot cells get a second-level split —
    the within-cell exact pass is embarrassingly parallel per cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Horner fold over the REVERSED leading dims: dim 1 lands on the
    # 2^0 bit, matching the oracle's 1 << (i-1) weighting.
    bucket = F.aggregate(
        F.reverse(F.slice("embedding", 1, SEMDEDUP_SIGN_DIMS)),
        F.lit(0),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0),
    )
    v = emb.select("vec_id", "embedding", bucket.cast("long").alias("bucket"))
    a, b = v.alias("a"), v.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine(F.col("a.embedding"), F.col("b.embedding")) >= 0.15)
        .select(
            F.col("a.vec_id").alias("keep_cand"), F.col("b.vec_id").alias("vec_id")
        )
    )
    kmin = pairs.groupBy("vec_id").agg(
        F.min("keep_cand").alias("min_neighbor"),
        F.count(F.lit(1)).cast("bigint").alias("n_smaller_neighbors"),
    )
    return v.join(kmin, "vec_id", "left").select(
        "vec_id",
        "bucket",
        F.coalesce("min_neighbor", "vec_id").alias("keeper_id"),
        F.col("min_neighbor").isNull().alias("is_kept"),
        F.coalesce("n_smaller_neighbors", F.lit(0).cast("bigint")).alias(
            "n_smaller_neighbors"
        ),
    )
