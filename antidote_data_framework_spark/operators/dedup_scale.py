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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

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


# Affine-hash MinHash for the hash-matched S-curve calibration:
# shingles map to dense integer ids via a vocabulary join
# (engine-identical, unlike xxhash64 which DuckDB lacks), then 64
# affine permutations a_i*x + b_i mod P with LARGE mixing multipliers
# a_i = (2i+1)*2654435761 mod P: small multipliers never wrap the
# modulus over a dense id domain, so every "permutation" would take
# its min at the smallest vid — measured 27x the theoretical
# collision rate at Jaccard~0 before this fix.
EVAL_K = 64
EVAL_BANDS = 16
EVAL_R = EVAL_K // EVAL_BANDS
EVAL_P = 2147483647
EVAL_COMBINE = 1000003


@spark_query(
    "q_minhash_scurve",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
sh AS (
  SELECT DISTINCT doc_id,
         t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS s
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
),
vocab AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS vid
  FROM (SELECT DISTINCT s FROM sh)
),
ids AS (SELECT sh.doc_id, v.vid FROM sh JOIN vocab v ON sh.s = v.s),
sigs AS (
  SELECT doc_id,
         list_transform(range(0, {EVAL_K}), i ->
           list_min(list_transform(vids,
             x -> (((2*i + 1) * 2654435761 % {EVAL_P}) * x + i * 40503 + 7)
                  % {EVAL_P})))
           AS sig,
         len(vids) AS n_sh
  FROM (SELECT doc_id, list(vid) AS vids FROM ids GROUP BY doc_id)
),
bands AS (
  SELECT doc_id, b.b AS band_id,
         ((sig[b.b*{EVAL_R} + 1] * {EVAL_COMBINE} + sig[b.b*{EVAL_R} + 2])
          % {EVAL_P} * {EVAL_COMBINE} + sig[b.b*{EVAL_R} + 3])
          % {EVAL_P} * {EVAL_COMBINE} % {EVAL_P} + sig[b.b*{EVAL_R} + 4] AS band_key
  FROM sigs, (SELECT UNNEST(range(0, {EVAL_BANDS})) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM ids a JOIN ids b ON a.vid = b.vid AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT j, collided, q*q AS q2 FROM (
    SELECT i.c * 1.0 / (sa.n_sh + sb.n_sh - i.c) AS j,
           1.0 - (i.c * 1.0 / (sa.n_sh + sb.n_sh - i.c))
               * (i.c * 1.0 / (sa.n_sh + sb.n_sh - i.c))
               * (i.c * 1.0 / (sa.n_sh + sb.n_sh - i.c))
               * (i.c * 1.0 / (sa.n_sh + sb.n_sh - i.c)) AS q,
           (cd.doc_a IS NOT NULL) AS collided
    FROM inter i
    JOIN sigs sa ON sa.doc_id = i.doc_a
    JOIN sigs sb ON sb.doc_id = i.doc_b
    LEFT JOIN cand cd ON cd.doc_a = i.doc_a AND cd.doc_b = i.doc_b
  )
)
SELECT CAST(LEAST(9, CAST(FLOOR(j * 10) AS BIGINT)) AS BIGINT) AS j_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN collided THEN 1 ELSE 0 END) AS BIGINT) AS n_collided,
       ROUND(SUM(CASE WHEN collided THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS empirical_rate,
       ROUND(AVG(1.0 - ((q2*q2) * (q2*q2)) * ((q2*q2) * (q2*q2))), 4)
         AS theoretical_rate
FROM scored
GROUP BY 1
""",
)
def q_minhash_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding S-CURVE calibration, hash-matched end to end:
    for every shingle-sharing document pair in a 5% cohort, did the
    16x4 banded signature make them candidates?  Grouped by exact-
    Jaccard decile, the empirical collision rate is laid against the
    theoretical 1-(1-s^4)^16 — the measurement that picks band
    geometry for a 100 TB dedup run (and the reason a PR-vs-threshold
    eval is useless on THIS corpus: no cohort pair reaches J=0.35, so
    the interesting region is the curve's low tail, which this
    reports and a precision/recall scalar cannot).

    The whole measurement is deterministic in BOTH engines because the
    sketch avoids engine-native hashes: shingles map to dense ids
    through a sorted-vocabulary join (vocabulary-bounded window), the
    64 permutations are explicit affine maps mod a prime (the
    q_countmin_sketch trick), and band keys are a polynomial combine
    of 4 signature slots.  The production twin (q_minhash_lsh) swaps
    the vocabulary join for xxhash64 — same plan, engine-specific
    sketch.  The theory column avoids libm pow() entirely — (1-s^4)^16
    is staged squarings written with IDENTICAL multiply structure in
    both engines (libm pow is not ulp-stable cross-runtime); the
    round-4 guard covers the AVG-order residue like every stats
    query.

    Measured insight (sf0.1): the affine family is 2-universal but
    only APPROXIMATELY min-wise independent, so the low tail runs
    ~0.25% empirical vs 0.01% theoretical — the exact excess a
    geometry decision needs to know about, invisible to theory alone
    (and 10x better than the small-multiplier bug this operator
    caught in its own first version: non-wrapping affine maps all
    elected the minimum vid, 2.7% at J~0).

    Shape: signatures are per-row array folds after one broadcast
    vocab join; candidates come from the banded equi-join; the exact
    pair scoring runs only on shingle-sharing cohort pairs (pairs
    sharing nothing have J=0 and no banding collision by
    construction — stated, not silently dropped)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    toks = F.split("text", " ")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            )
        ).alias("s"),
    )
    vocab = (
        sh.select("s")
        .distinct()
        .withColumn("vid", F.row_number().over(Window.orderBy("s")).cast("long"))
    )
    ids = sh.join(bcast(vocab, "LIMIT-bounded vocabulary"), "s").select("doc_id", "vid")
    grouped = ids.groupBy("doc_id").agg(F.collect_list("vid").alias("vids"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(EVAL_K - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("vids"),
                lambda x: (((2 * i + 1) * F.lit(2654435761) % EVAL_P) * x
                           + i * 40503 + 7) % EVAL_P,
            )
        ),
    )
    sigs = grouped.select(
        "doc_id", sig.alias("sig"), F.size("vids").alias("n_sh")
    )
    band_key = (
        (
            (
                F.element_at("sig", F.col("b") * EVAL_R + 1) * EVAL_COMBINE
                + F.element_at("sig", F.col("b") * EVAL_R + 2)
            )
            % EVAL_P
            * EVAL_COMBINE
            + F.element_at("sig", F.col("b") * EVAL_R + 3)
        )
        % EVAL_P
        * EVAL_COMBINE
        % EVAL_P
        + F.element_at("sig", F.col("b") * EVAL_R + 4)
    )
    bands = sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(EVAL_BANDS - 1))).alias("b"),
        "sig",
    ).select("doc_id", F.col("b").alias("band_id"), band_key.alias("band_key"))
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ia, ib = ids.alias("ia"), ids.alias("ib")
    inter = (
        ia.join(
            ib,
            (F.col("ia.vid") == F.col("ib.vid"))
            & (F.col("ia.doc_id") < F.col("ib.doc_id")),
        )
        .groupBy(
            F.col("ia.doc_id").alias("doc_a"), F.col("ib.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    scored = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .join(cand.withColumn("collided", F.lit(True)), ["doc_a", "doc_b"], "left")
        .select(
            (
                F.col("c") * 1.0 / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("c"))
            ).alias("j"),
            F.coalesce("collided", F.lit(False)).alias("collided"),
        )
    )
    # staged squarings, grouped identically to the oracle:
    # q16 = (q4*q4) with q4 = q2*q2 — no libm pow anywhere.
    q = 1.0 - F.col("j") * F.col("j") * F.col("j") * F.col("j")
    q2 = q * q
    q4 = q2 * q2
    q8 = q4 * q4
    theory = 1.0 - q8 * q8
    return scored.groupBy(
        F.least(F.lit(9), F.floor(F.col("j") * 10)).cast("bigint").alias("j_decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("collided"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_collided"),
        F.round(
            F.sum(F.when(F.col("collided"), 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("empirical_rate"),
        F.round(F.avg(theory), 4).alias("theoretical_rate"),
    )
