"""Corpus retrieval operators — TF-IDF term weighting and BM25 ranked
search over ``documents``.

The training-data use case: keyword-driven corpus slicing ("pull every
doc that scores highly for these domain terms") and per-document salient
-term extraction for topic bucketing / mixture design.  Both are pure
relational plans: the exploded (term, doc) posting table IS the inverted
index — term-keyed aggregation builds postings statistics, and a search
is an equi-join against the query's term list, never a corpus scan per
query term.

Scale posture (100 TB): tokens explode to one row per token (the corpus
itself — unavoidable for exact statistics); per-(doc,term) counts are
one shuffle keyed by (doc_id, term); document frequencies group-reduce
to a VOCABULARY-sized table that joins back via broadcast.  The BM25
query-term list is a literal filter pushed into the posting scan, so a
search touches only the postings of its query terms — exactly the
access pattern a dedicated inverted index gives, expressed as a filter
+ broadcast join.

Determinism: counts are exact BIGINTs; idf uses LN over identical
double formulations in both engines (cross-engine stability of LN is
already hash-proven by q_scalar_datetime/price_ln); ordering uses the
exact double score with doc/term tie-breaks; only outputs are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table

# Fixed search query for q_bm25_search — terms present in the fixture
# vocabulary with distinct document frequencies.
BM25_QUERY_TERMS = ("hash", "join", "merge", "vector")
BM25_K1 = 1.2
BM25_B = 0.75


@spark_query(
    "q_tfidf_topterms",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, df,
         ROUND(score, 4) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by smoothed TF-IDF
    (``tf * ln((N+1)/(df+1))``) — the topic-bucketing / keyword
    extraction stage of a corpus pipeline.

    Plan: explode → one (doc_id, term) shuffle for tf → vocab-sized
    df reduction joined back → one doc_id-partitioned window for the
    top-3.  The df join is deliberately NOT hint-broadcast: an open
    web vocabulary (typos, URLs) is unbounded, so Catalyst/AQE picks
    broadcast under threshold and sort-merge beyond it — the one
    case in this module where forcing the hint would be a 100 TB
    foot-gun.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(bcast(n_docs, "1-row doc-count agg"))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("score", 4).alias("tfidf"),
            "rnk",
        )
    )


@spark_query(
    "q_bm25_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(dl) * 1.0 / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ({", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           LN(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                   + {BM25_B} * dl.dl / stats.avgdl))
         ) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, n_terms_hit, ROUND(score, 4) AS bm25
FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked search: top-20 documents for a fixed keyword query
    (k1=1.2, b=0.75, Robertson idf ``ln(1 + (N-df+.5)/(df+.5))``).

    The inverted-index access pattern without a side index: the query
    -term literal IN-filter is pushed into the posting scan (only
    matching terms' postings survive the explode), df and corpus
    stats are 1-row / vocab-row broadcasts, and the per-doc score is
    one aggregation keyed by doc_id.  At 100 TB the posting table
    would be pre-materialized and bucketed by term; the query plan —
    filter postings by term, join tiny stats, reduce by doc — is
    identical either way.

    Determinism: exact-count inputs; identical LN formulation both
    engines; ORDER BY exact score with doc_id tie-break; LIMIT 20.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df here is bounded BY CONSTRUCTION at |query terms| rows (tf is
    # already filtered to the query's term list), so the hint is safe.
    df_q = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(bcast(df_q, "query-term-bounded doc-frequency table"), "term")
        .join(dl, "doc_id")
        .crossJoin(bcast(stats, "1-row global-moment aggregate"))
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_terms_hit", F.round("score", 4).alias("bm25"))
    )


# Reciprocal-rank-fusion constant (Cormack et al., SIGIR 2009): 60 is
# the published default; small denominators keep every 1/(K+r) term an
# exact ratio of small ints, bit-identical across engines.
RRF_K = 60
RRF_DEPTH = 50  # per-retriever candidate depth


@spark_query(
    "q_rrf_hybrid_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(dl) * 1.0 / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ({", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
bm25 AS (
  SELECT tf.doc_id,
         SUM(
           LN(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                   + {BM25_B} * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
bm25_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bm25
  ORDER BY score DESC, doc_id LIMIT {RRF_DEPTH}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id AS doc_id,
         list_sum(list_transform(list_zip(e.embedding, q.qe),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
            * SQRT(list_sum(list_transform(q.qe,
                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
         AS cos_raw
  FROM embeddings e, q
  WHERE e.vec_id <> 0
),
vec_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos_raw DESC, doc_id) AS r
  FROM sims
  ORDER BY cos_raw DESC, doc_id LIMIT {RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         (CASE WHEN b.r IS NULL THEN 0.0
               ELSE 1.0 / ({RRF_K} + b.r) END
          + CASE WHEN v.r IS NULL THEN 0.0
                 ELSE 1.0 / ({RRF_K} + v.r) END) AS rrf,
         b.r AS bm25_rank, v.r AS vec_rank
  FROM bm25_rank b FULL OUTER JOIN vec_rank v ON b.doc_id = v.doc_id
)
SELECT doc_id,
       CAST(ROUND(rrf, 6) AS DOUBLE) + 0.0 AS rrf_score,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT 10
""",
)
def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (RRF, K=60) of a
    lexical BM25 ranking and a dense cosine ranking over the same
    corpus (``documents.doc_id`` = ``embeddings.vec_id``) — the
    standard RAG-stack merge when one retriever misses what the
    other finds.  ``score = Σ 1/(K + rank)`` over the lists that
    contain the doc; a FULL OUTER join keeps single-list hits with
    their one-term score.

    Plan: each retriever independently produces a depth-50
    TakeOrdered candidate list (global top-k, no full sort — both
    lists are driver-bounded at RRF_DEPTH rows), then the fusion is
    a full outer join of two 50-row sets — broadcastable trivially,
    cost invisible at any scale.  At 100 TB the two candidate
    generators are the expensive legs (posting-filter scan; ANN
    probe) and both are already bounded: fusion cost never grows.

    Determinism: ranks are exact ints from (score, doc_id)-tie-broken
    row_numbers; 1/(K+r) terms are ratios of small ints summed in one
    IEEE add — bit-identical; output rounds to 6.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_q = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    bm25 = (
        tf.join(bcast(df_q, "query-term-bounded doc-frequency table"), "term")
        .join(dl, "doc_id")
        .crossJoin(bcast(stats, "1-row global-moment aggregate"))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_DEPTH)
    )
    w_b = Window.orderBy(F.col("score").desc(), "doc_id")
    bm25_rank = bm25.select(
        "doc_id", F.row_number().over(w_b).alias("bm25_r")
    )

    from .vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(bcast(q, "1-row query vector"))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qe")).alias("cos_raw"),
        )
        .orderBy(F.col("cos_raw").desc(), "doc_id")
        .limit(RRF_DEPTH)
    )
    w_v = Window.orderBy(F.col("cos_raw").desc(), "doc_id")
    vec_rank = sims.select(
        "doc_id", F.row_number().over(w_v).alias("vec_r")
    )

    fused = bm25_rank.join(vec_rank, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.when(F.col("bm25_r").isNull(), F.lit(0.0)).otherwise(
                1.0 / (RRF_K + F.col("bm25_r"))
            )
            + F.when(F.col("vec_r").isNull(), F.lit(0.0)).otherwise(
                1.0 / (RRF_K + F.col("vec_r"))
            )
        ).alias("rrf"),
        F.col("bm25_r").cast("long").alias("bm25_rank"),
        F.col("vec_r").cast("long").alias("vec_rank"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            (F.round("rrf", 6).cast("double") + F.lit(0.0)).alias("rrf_score"),
            "bm25_rank",
            "vec_rank",
        )
    )
