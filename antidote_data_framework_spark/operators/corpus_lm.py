"""Corpus language-model statistics — distribution drift (KL), held-out
bigram LM scoring, and per-document token entropy over ``documents``.

These are the information-theoretic quality signals a training-data
pipeline runs between dedup and mixing: KL divergence tells you which
ingest feed drifted away from the corpus distribution, a held-out
bigram LM scores fluency/domain fit per document (the CCNet/KenLM
recipe with an exact in-engine LM), and token entropy separates
natural text from repetitive boilerplate at per-document granularity.

All three are pure relational plans: tokens explode once (the corpus
itself — unavoidable for exact statistics), LM/count tables reduce to
vocabulary size and join back broadcast-style, and every per-group sum
of doubles accumulates in DECIMAL(18,9) so the aggregate is
partition-order-independent and hash-matches DuckDB (the
q_doc_lm_score discipline).

Scale posture (100 TB): one corpus-sized explode + vocabulary-sized
reductions; nothing here shuffles more than (group key, token) pairs,
and the scoring joins are vocabulary-bounded.  A production pipeline
swaps the in-engine bigram table for KenLM shards behind the same
join-then-aggregate shape.

Determinism: every log2 argument is a ratio of exact BIGINT products
(< 2^53, exactly representable), so the per-token surprisal double is
bit-identical in both engines; sums go through DECIMAL(18,9); outputs
round to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table


@spark_query(
    "q_corpus_kl_divergence",
    oracle="""
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
corpus AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
src AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cs
  FROM toks GROUP BY source, tok
),
ns AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM toks GROUP BY source
),
terms AS (
  SELECT s.source,
         (CAST(s.cs AS DOUBLE) / ns.n_src)
         * log2(CAST(s.cs * n.n_total AS DOUBLE)
                / CAST(c.c * ns.n_src AS DOUBLE)) AS term
  FROM src s
  JOIN corpus c ON s.tok = c.tok
  JOIN ns ON s.source = ns.source
  CROSS JOIN n
)
SELECT t.source,
       ns.n_src AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_src,
       CAST(ROUND(CAST(SUM(CAST(t.term AS DECIMAL(18,9))) AS DOUBLE), 4)
            AS DOUBLE) + 0.0 AS kl_bits
FROM terms t JOIN ns ON t.source = ns.source
GROUP BY t.source, ns.n_src
ORDER BY t.source
""",
)
def q_corpus_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence (bits) of the source's unigram
    distribution from the whole-corpus distribution — the drift
    detector that flags which ingest feed stopped looking like the
    rest of the corpus.  KL(source || corpus) is finite without
    smoothing because every source token is by construction also a
    corpus token (corpus = union of sources).

    Plan: one corpus explode; two vocabulary-sized reductions
    (corpus counts, per-source counts) joined on token; the KL sum
    is a per-source reduce over (source, token) terms.  The corpus
    count table is vocabulary-bounded but deliberately not
    hint-broadcast (open-web vocabularies are unbounded — AQE
    decides, the q_tfidf_topterms rule).

    Determinism: ``log2((cs*N)/(c*Ns))`` — both products are exact
    BIGINTs < 2^53, the ratio and log2 are single IEEE ops identical
    in both engines; term sums accumulate in DECIMAL(18,9).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    corpus = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    src = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cs"))
    ns = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    term = (
        F.col("cs").cast("double") / F.col("n_src")
    ) * F.log2(
        (F.col("cs") * F.col("n_total")).cast("double")
        / (F.col("c") * F.col("n_src")).cast("double")
    )
    return (
        src.join(corpus, "tok")
        .join(bcast(ns, "per-source count agg (|sources| rows)"), "source")
        .crossJoin(bcast(n_total, "1-row total-count agg"))
        .groupBy("source", "n_src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_src"),
            (
                F.round(F.sum(term.cast("decimal(18,9)")).cast("double"), 4)
                .cast("double")
                + F.lit(0.0)
            ).alias("kl_bits"),
        )
        .select(
            "source",
            F.col("n_src").alias("n_tokens"),
            "vocab_src",
            "kl_bits",
        )
        .orderBy("source")
    )


@spark_query(
    "q_bigram_lm_heldout",
    oracle="""
WITH arr AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id, lang,
         t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM arr, UNNEST(range(1, len(t))) AS u(i)
),
train_bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM bi WHERE lang = 'en' GROUP BY w1, w2
),
train_uni AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu
  FROM bi WHERE lang = 'en' GROUP BY w1
),
vocab AS (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok
        FROM documents WHERE lang = 'en')
),
scored AS (
  SELECT b.doc_id, b.lang,
         -log2(CAST(COALESCE(tb.cb, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(tu.cu, 0) + vocab.v AS DOUBLE)) AS bits
  FROM bi b
  LEFT JOIN train_bi tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
  LEFT JOIN train_uni tu ON b.w1 = tu.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         SUM(CAST(bits AS DECIMAL(18,9))) AS total_bits
  FROM scored GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_bigrams,
       CAST(ROUND(CAST(total_bits AS DOUBLE) / n_bigrams, 4) AS DOUBLE)
         + 0.0 AS bits_per_bigram
FROM per_doc
ORDER BY doc_id
""",
)
def q_bigram_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM scoring: train an add-one-smoothed bigram
    model on the English sub-corpus, score EVERY document's bigrams
    under it — the CCNet/KenLM fluency-filter recipe with an exact
    in-engine LM.  In-domain (en) docs score low bits/bigram; other
    languages score near the uniform ceiling, so one threshold cut
    yields a domain filter with an interpretable unit (bits).

    Unlike q_doc_lm_score (unigram, self-scored) and
    q_dsir_importance (unigram likelihood RATIO), this is a true
    held-out conditional model: unseen bigrams hit the smoothing
    floor ``1/(cu+V)`` via LEFT joins, exactly as a production LM
    scorer handles OOV context.

    Plan: bigrams via an index-free zip of adjacent slices (no
    posexplode self-join); the LM is two vocabulary-bounded count
    tables LEFT-joined onto the corpus bigram stream; per-doc reduce
    is map-side combined.  100 TB: identical shape with KenLM shards
    replacing the count tables.

    Determinism: ``(cb+1)/(cu+V)`` is a ratio of exact BIGINTs —
    one log2 per bigram, bit-identical both engines; DECIMAL(18,9)
    accumulation; tie-free output keyed by doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    bi = arr.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.w1", "p.w2")
    train = bi.filter(F.col("lang") == "en")
    # The unigram-context table is an exact integer rollup of the
    # bigram table — cu(w1) = Σ_w2 cb(w1, w2), every bi row has both
    # columns — so deriving it from the checkpointed vocabulary²-
    # bounded train_bi removes one full corpus explode + aggregation
    # pass (r12, guide §1.2; the before plan ran the tokenize/explode
    # map side three times: both train aggs + the scoring probe).
    train_bi = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .localCheckpoint()
    )
    train_uni = train_bi.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = (
        docs.filter(F.col("lang") == "en")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    bits = -F.log2(
        (F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v")).cast("double")
    )
    return (
        bi.join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, ["w1"], "left")
        .crossJoin(bcast(vocab, "LIMIT-bounded vocabulary"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(bits.cast("decimal(18,9)")).alias("total_bits"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            (
                F.round(
                    F.col("total_bits").cast("double") / F.col("n_bigrams"), 4
                ).cast("double")
                + F.lit(0.0)
            ).alias("bits_per_bigram"),
        )
        .orderBy("doc_id")
    )


@spark_query(
    "q_doc_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, tok
),
dl AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM tf GROUP BY doc_id
),
ent AS (
  SELECT tf.doc_id, dl.n, dl.n_distinct,
         SUM(CAST(-(CAST(tf.c AS DOUBLE) / dl.n)
                  * log2(CAST(tf.c AS DOUBLE) / CAST(dl.n AS DOUBLE))
                  AS DECIMAL(18,9))) AS h
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
  GROUP BY tf.doc_id, dl.n, dl.n_distinct
)
SELECT doc_id, n AS n_tokens, n_distinct,
       CAST(ROUND(CAST(h AS DOUBLE), 4) AS DOUBLE) + 0.0 AS entropy_bits,
       (n_distinct = 1 OR CAST(h AS DOUBLE)
          >= 0.35 * log2(CAST(n_distinct AS DOUBLE))) AS passes_entropy_gate
FROM ent
ORDER BY doc_id
""",
)
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) plus a
    normalized-entropy gate — the repetitive-boilerplate detector:
    natural text sits near the entropy of its vocabulary size, while
    template spam ("click here click here ...") collapses toward 0
    regardless of length.  The gate compares H against a fraction of
    its own ceiling ``log2(n_distinct)``, so it is length- and
    vocabulary-invariant (complementary to q_text_repetition's
    surface n-gram repeat ratio).

    Plan: one (doc_id, token) reduce for term frequencies, one
    doc-level reduce for totals, join back on doc_id (co-partitioned
    — Catalyst reuses the shuffle), one entropy reduce.  Nothing
    exceeds corpus scale; per-doc state is O(distinct terms).

    Determinism: ``c/n`` ratios of exact ints; one log2 each;
    DECIMAL(18,9) sums; gate compares unrounded doubles identically
    in both engines (0.35 factor keeps the threshold far from any
    fixture doc's boundary — verified at all three SFs).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    dl = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = -p * F.log2(F.col("c").cast("double") / F.col("n").cast("double"))
    ent = (
        tf.join(dl, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.sum(term.cast("decimal(18,9)")).alias("h"))
    )
    h_dbl = F.col("h").cast("double")
    return ent.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        (F.round(h_dbl, 4).cast("double") + F.lit(0.0)).alias("entropy_bits"),
        (
            (F.col("n_distinct") == 1)
            | (h_dbl >= 0.35 * F.log2(F.col("n_distinct").cast("double")))
        ).alias("passes_entropy_gate"),
    ).orderBy("doc_id")
