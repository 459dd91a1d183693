"""Text-analysis operators for training-data pipelines — north-star
mandated (BASELINE.json: "text analysis" as a first-class component).

Language-ID, quality scoring, token counting, and document
fingerprinting over ``documents`` — all pure built-in expressions
(split/explode/conditional aggregation), all SQL-oracled.  At 100 TB
these run inside whole-stage codegen on the scan stage; the only
shuffle is the final per-doc or per-corpus aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ("the", "of", "and", "to", "a"),
    "es": ("el", "de", "la", "que", "y"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
}


def _marker_frac(lang: str):
    toks = F.split("text", " ")
    hits = F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS[lang])))
    return hits / F.size(toks)


def _marker_frac_sql(lang: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), w -> w IN ({in_list}))) * 1.0"
        f" / len(string_split(text, ' '))"
    )


@spark_query(
    "q_text_quality",
    oracle="""
SELECT doc_id, lang,
       LENGTH(text)                                       AS n_chars_measured,
       len(string_split(text, ' '))                       AS n_tokens,
       ROUND(LENGTH(text) * 1.0 / len(string_split(text, ' ')), 4) AS avg_token_len,
       len(list_filter(string_split(text, ' '), w -> LENGTH(w) <= 3)) AS n_short_tokens,
       ROUND(len(list_filter(string_split(text, ' '), w -> LENGTH(w) <= 3)) * 1.0
             / len(string_split(text, ' ')), 4)           AS short_token_ratio,
       (LENGTH(text) BETWEEN 100 AND 400
        AND len(string_split(text, ' ')) >= 20)           AS passes_quality
FROM documents
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, token count, average token
    length, short-token ratio, and a composite pass/fail gate — the
    filter stage of an LLM-data pipeline, fully in codegen."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_short = F.size(F.filter(toks, lambda w: F.length(w) <= 3))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        F.round(F.length("text") / n_tokens, 4).alias("avg_token_len"),
        n_short.alias("n_short_tokens"),
        F.round(n_short / n_tokens, 4).alias("short_token_ratio"),
        (
            F.length("text").between(100, 400) & (n_tokens >= 20)
        ).alias("passes_quality"),
    )


@spark_query(
    "q_text_langid",
    oracle="""
SELECT doc_id, lang AS labeled_lang,
       ROUND({en}, 4) AS en_score,
       ROUND({es}, 4) AS es_score,
       ROUND({de}, 4) AS de_score,
       ROUND({fr}, 4) AS fr_score,
       CASE GREATEST({en}, {es}, {de}, {fr})
            WHEN {en} THEN 'en' WHEN {es} THEN 'es'
            WHEN {de} THEN 'de' ELSE 'fr' END AS predicted_lang
FROM documents
""".format(
        en=_marker_frac_sql("en"),
        es=_marker_frac_sql("es"),
        de=_marker_frac_sql("de"),
        fr=_marker_frac_sql("fr"),
    ),
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by marker-word fractions (the stopword
    n-gram heuristic): score per candidate language, argmax with a
    fixed precedence for ties.  A real pipeline swaps the lexicons for
    character-n-gram tables — the plan shape is identical."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {lang: _marker_frac(lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["de"] == best, "de")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.round(scores[lang], 4).alias(f"{lang}_score") for lang in LANG_MARKERS],
        pred.alias("predicted_lang"),
    )


@spark_query(
    "q_text_tokens",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' '))                   AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_re_tokens,
       len(list_distinct(string_split(text, ' ')))    AS n_unique_tokens
FROM documents
""",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split and a BPE-ish regex
    ([a-z]+|[0-9]+ runs) — plus unique-token count.  The cost model
    input for training-data budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias("n_re_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_unique_tokens"),
    )


@spark_query(
    "q_tokenizer_fertility",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS re_tokens,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
       CAST((SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) * 20000
             + SUM(len(string_split(text, ' '))))
            // NULLIF(2 * SUM(len(string_split(text, ' '))), 0) AS DOUBLE) / 10000.0
         AS fertility_re_per_ws,
       CAST((SUM(LENGTH(text)) * 20000
             + SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))))
            // NULLIF(2 * SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))), 0)
            AS DOUBLE)
         / 10000.0 AS chars_per_re_token
FROM documents
GROUP BY lang
""",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — the multilingual-budgeting
    metric (how many tokenizer tokens per whitespace word, and how
    many characters each token covers): a language whose fertility is
    2x costs 2x the context window for the same text, which skews both
    corpus mixing and serving costs.  Uses the same BPE-ish regex
    token law as q_text_tokens so the two reconcile.

    Determinism: both ratios are rounded to 4 dp via the exact-integer
    half-up identity (a*2e4 + b) div (2b) — the ratio of two bigint
    sums is a rational whose double quotient can straddle a .xxxx5
    boundary differently per engine (the q_reagg_partial lesson from
    the sf0.1 sweep); integer arithmetic makes both engines compute
    the SAME integer, then one shared double division.  Zero-token
    language buckets yield NULL ratios on BOTH engines (r6 ADVICE:
    nullif guards — Spark's integer div already nulls on 0, DuckDB's
    ``//`` would raise instead of producing a comparable row).
    Scale: counts fold map-side in the scan stage; the shuffle is
    |langs| rows."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("ws_tokens"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)))
        .cast("bigint")
        .alias("re_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("chars"),
    )
    return per.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "re_tokens",
        "chars",
        (
            F.expr(
                "(re_tokens * 20000 + ws_tokens) div nullif(2 * ws_tokens, 0)"
            ).cast("double")
            / F.lit(10000.0)
        ).alias("fertility_re_per_ws"),
        (
            F.expr(
                "(chars * 20000 + re_tokens) div nullif(2 * re_tokens, 0)"
            ).cast("double")
            / F.lit(10000.0)
        ).alias("chars_per_re_token"),
    )


@spark_query(
    "q_ngram_novelty",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tri AS (
  SELECT DISTINCT doc_id,
         t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS g
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM tri GROUP BY g)
SELECT tri.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN f.first_doc = tri.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST((SUM(CASE WHEN f.first_doc = tri.doc_id THEN 1 ELSE 0 END) * 20000
             + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000.0 AS novelty
FROM tri JOIN first f ON f.g = tri.g
GROUP BY tri.doc_id
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    word trigrams whose corpus-wide first occurrence (min doc_id) is
    the doc itself — i.e. how much genuinely new text each document
    adds in ingestion order.  The monitoring curve behind dedup and
    curriculum decisions: a corpus whose marginal novelty decays to
    ~0 is re-crawling itself, and the docs driving the decay are the
    rewrite/prune candidates (they reconcile with
    q_dedup_chunk_rewrite's kept-token accounting at chunk
    granularity).

    Shape: one distinct-(doc, trigram) explode in the scan stage, one
    groupBy(g) electing first owners (partial-aggregated MIN — the
    same election as chunk dedup), one hash join back, one per-doc
    rollup.  Only (16-byte-ish trigram, doc_id) pairs ever shuffle.
    Novelty rounds via the exact-integer half-up identity so both
    engines emit the same double."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    tri = (
        docs.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    first = tri.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    joined = tri.join(first, "g")
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    per = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.sum(novel).cast("bigint").alias("n_novel"),
    )
    return per.select(
        "doc_id",
        "n_trigrams",
        "n_novel",
        (
            F.expr("(n_novel * 20000 + n_trigrams) div (2 * n_trigrams)").cast(
                "double"
            )
            / F.lit(10000.0)
        ).alias("novelty"),
    )


@spark_query(
    "q_doc_fingerprint",
    oracle="""
SELECT d.doc_id,
       CAST(SUM(LENGTH(w.tok) * 31 + (ord(w.tok[1]) % 97)) % 1000000007 AS BIGINT) AS bag_fingerprint,
       COUNT(*) AS n_tokens
FROM documents d, UNNEST(string_split(d.text, ' ')) AS w(tok)
GROUP BY d.doc_id
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent bag fingerprint per document: an arithmetic
    hash over the token multiset (mod a large prime), engine-portable
    by construction (no engine hash functions).  The cheap pre-filter
    before exact/minhash dedup: equal fingerprints → candidate dups."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    contrib = F.length("tok") * 31 + (F.ascii(F.substring("tok", 1, 1)) % 97)
    return tok.groupBy("doc_id").agg(
        (F.sum(contrib) % 1000000007).alias("bag_fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


@spark_query(
    "q_corpus_curation",
    oracle="""
WITH q AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tokens,
         (LENGTH(text) BETWEEN 100 AND 400
          AND len(string_split(text, ' ')) >= 20) AS ok
  FROM documents
),
tot AS (SELECT lang, COUNT(*) AS n_total FROM q GROUP BY lang),
qual AS (SELECT lang, COUNT(*) AS n_quality FROM q WHERE ok GROUP BY lang),
kept AS (
  SELECT lang, n_tokens FROM (
    SELECT lang, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q WHERE ok
  ) WHERE rn = 1
),
k AS (
  SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
  FROM kept GROUP BY lang
)
SELECT t.lang, t.n_total,
       COALESCE(qu.n_quality, 0) AS n_quality,
       COALESCE(k.n_kept, 0)     AS n_kept,
       COALESCE(k.tokens_kept, 0) AS tokens_kept
FROM tot t
LEFT JOIN qual qu ON qu.lang = t.lang
LEFT JOIN k       ON k.lang = t.lang
""",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation funnel per language:
    raw docs → quality gate (q_text_quality's criteria) → exact dedup
    (md5 content hash, min-doc_id survivor) → kept-token budget.

    This is the composed pipeline the individual text operators feed:
    one scan computes tokens+gate, the dedup is a window over the
    content hash (shuffle keyed on md5 — uniformly distributed, no
    skew at any scale), and the three funnel stages aggregate to
    lang-level rows before the final small joins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        (F.length("text").between(100, 400) & (F.size(toks) >= 20)).alias("ok"),
    )
    tot = q.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    qual = q.filter("ok").groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    kept = (
        q.filter("ok")
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
    )
    return (
        tot.join(qual, "lang", "left")
        .join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )


@spark_query(
    "q_text_repetition",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
         list_max(list_transform(list_distinct(toks),
                  x -> len(list_filter(toks, w -> w = x))))          AS top_cnt,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(list_zip(list_slice(toks, 1, len(toks)-1),
                                   list_slice(toks, 2, len(toks))),
                          p -> p[1] || ' ' || p[2])
         ELSE [] END                                                 AS bigrams
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(top_cnt * 1.0 / NULLIF(n_tokens, 0), 4)                 AS top_token_frac,
       ROUND(COALESCE(1 - len(list_distinct(bigrams)) * 1.0
                          / NULLIF(len(bigrams), 0), 0.0), 4)        AS dup_bigram_frac,
       (top_cnt * 1.0 / NULLIF(n_tokens, 0) > 0.14
        OR COALESCE(1 - len(list_distinct(bigrams)) * 1.0
                        / NULLIF(len(bigrams), 0), 0.0) > 0.06)      AS is_repetitive
FROM m
""",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition / boilerplate detection — the
    Gopher-style repetition filter of an LLM-data curation pipeline:
    the fraction of tokens taken by the single most frequent token,
    and the fraction of duplicated bigram instances; documents beyond
    either threshold are flagged for removal.

    Pure higher-order array functions on the scan stage (no explode,
    no shuffle until output): per row, token counts come from
    filter/transform over the token array and bigrams from zipping
    the array with its own tail — O(distinct x tokens) per document,
    embarrassingly parallel at any corpus size."""
    toks = F.split("text", " ")
    n = F.size(toks)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda x: F.size(F.filter(toks, lambda w: w == x)),
        )
    )
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_frac = top_cnt / F.nullif(n, F.lit(0))
    dup_frac = F.coalesce(
        1 - F.size(F.array_distinct(bigrams)) / F.nullif(F.size(bigrams), F.lit(0)),
        F.lit(0.0),
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.round(top_frac, 4).alias("top_token_frac"),
        F.round(dup_frac, 4).alias("dup_bigram_frac"),
        ((top_frac > 0.14) | (dup_frac > 0.06)).alias("is_repetitive"),
    )


@spark_query(
    "q_corpus_boilerplate_ngrams",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 2),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram
  FROM toks WHERE len(t) >= 4
)
SELECT gram, n_docs, n_occurrences FROM (
  SELECT gram,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         COUNT(*)                               AS n_occurrences
  FROM sh GROUP BY gram
) WHERE n_docs >= 3
ORDER BY n_docs DESC, n_occurrences DESC, gram
LIMIT 50
""",
)
def q_corpus_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate discovery — the corpus-level
    complement of q_text_repetition: 4-gram spans appearing in many
    DIFFERENT documents (headers, footers, license blocks, template
    text in a real crawl), ranked by document reach.  LLM curation
    removes or downweights these spans before training.

    Shape: shingle explosion on the scan stage, one groupBy(gram)
    shuffle with partial aggregation, distinct-doc counts, tie-broken
    top-k.  At 100 TB the gram key is the shuffle payload — hash the
    gram to 64 bits for the aggregation and keep an example string via
    min() to cut shuffle width ~4x (kept as plain text here for oracle
    parity)."""
    docs = load_table(spark, sf_dir, "documents")
    # split() is materialized as a column BEFORE the transform: an
    # unresolved expression referenced inside a higher-order-function
    # lambda is re-evaluated per element (split-per-token — measured
    # 4.5x slower at sf0.1)
    base = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 4
    )
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i),
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
            F.element_at(t, i + 3),
        ),
    )
    return (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "gram")
        .limit(50)
    )


@spark_query(
    "q_decontaminate_overlap",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 3),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
  FROM toks WHERE len(t) >= 5
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0)
SELECT g.doc_id,
       CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_shared_grams,
       COUNT(DISTINCT g.gram) >= 3            AS contaminated
FROM grams g JOIN ev USING (gram)
WHERE g.doc_id % 20 <> 0
GROUP BY g.doc_id
""",
)
def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the eval-leak filter every LLM
    training pipeline runs (the GPT-3-style n-gram overlap check):
    training documents sharing >= 3 distinct 5-gram spans with the
    held-out eval slice (doc_id % 20 == 0 stands in for a benchmark
    set) are flagged for removal; any overlap at all is reported.

    Shape: shingle both corpora on the scan stage, build the DISTINCT
    eval-gram set (small relative to the corpus: |benchmarks| not
    |training data|), equi-join training shingles against it, count
    distinct hits per training doc.  At 100 TB the eval-gram set
    broadcasts (benchmarks are megabytes) so the join is shuffle-free
    on the training side; here it is left to the planner."""
    grams = five_grams(load_table(spark, sf_dir, "documents"))
    eval_grams = (
        grams.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 20 != 0)
        .join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .select(
            "doc_id",
            "n_shared_grams",
            (F.col("n_shared_grams") >= 3).alias("contaminated"),
        )
    )


@spark_query(
    "q_text_chunk",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
m AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) <= 64 THEN 1
              ELSE CAST(FLOOR((len(t) - 17) / 48.0) AS BIGINT) + 1 END AS n_chunks
  FROM toks WHERE len(t) > 0
),
c AS (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS cidx FROM m)
SELECT doc_id,
       CAST(cidx AS BIGINT)                      AS chunk_idx,
       CAST(LEAST(64, n - cidx * 48) AS BIGINT)  AS n_tokens_in_chunk,
       t[cidx * 48 + 1]                          AS first_token,
       t[cidx * 48 + LEAST(64, n - cidx * 48)]   AS last_token
FROM c
""",
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the pretraining/RAG prep stage: each
    document splits into 64-token chunks on a 48-token stride (16
    tokens of overlap so no span is ever cut without context).  Emits
    one row per chunk with its exact token count and boundary tokens,
    so the split is verifiable without shipping token arrays.

    Shape: per-row chunk-count arithmetic + one explode — all inside
    the scan stage, no shuffle at all (the output IS the training
    shard stream).  At 100 TB chunk rows write straight to the
    partitioned sink; chunk_idx preserves document order for
    sequence-packing downstream."""
    CHUNK, STRIDE = 64, 48
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.when(n <= CHUNK, F.lit(1)).otherwise(
        F.floor((n - F.lit(17)) / F.lit(48.0)) + 1
    )
    out = (
        docs.filter(n > 0)
        .select("doc_id", toks.alias("t"), n.alias("n"), n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "t",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("cidx"),
        )
    )
    start = F.col("cidx") * STRIDE + 1
    length = F.least(F.lit(CHUNK), F.col("n") - F.col("cidx") * STRIDE)
    return out.select(
        "doc_id",
        F.col("cidx").cast("long").alias("chunk_idx"),
        length.cast("long").alias("n_tokens_in_chunk"),
        F.element_at("t", start.cast("int")).alias("first_token"),
        F.element_at("t", (start + length - 1).cast("int")).alias("last_token"),
    )


@spark_query(
    "q_corpus_mixture",
    oracle="""
WITH w AS (
  SELECT source, COUNT(*) AS n_docs,
         1 + (CAST(SUBSTR(source, 4) AS INTEGER) % 3) AS weight
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total, SUM(weight * n_docs) AS wsum FROM w),
r AS (
  SELECT w.source, w.n_docs, w.weight,
         CAST(FLOOR(100 * LEAST(1.0, 0.6 * tot.n_total * w.weight / tot.wsum)) AS BIGINT) AS pct_kept
  FROM w CROSS JOIN tot
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN r ON d.source = r.source
  WHERE d.doc_id % 100 < r.pct_kept
  GROUP BY d.source
),
f AS (
  SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs, CAST(r.weight AS BIGINT) AS weight,
         r.pct_kept, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
  FROM r LEFT JOIN kept k ON r.source = k.source
)
SELECT source, n_docs, weight, pct_kept, n_kept,
       ROUND(n_kept * 1.0 / SUM(n_kept) OVER (), 4) AS achieved_share
FROM f
""",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing — the data-mixture step of corpus
    assembly: per-source quality weights (here a deterministic law of
    the source id; in production, curated weights) turn into capped
    keep rates hitting a 60% overall budget, and the sample itself is
    a reproducible modulo filter (no rand() — stable across engines,
    partitionings, retries).  Emits the plan AND the achieved mix so
    drift between target and achievable is visible.

    Shape: two aggregations over source counts (a |sources|-row
    table), one broadcast-sized join back to the corpus for the
    filtered count — at 100 TB the rate table is bytes and rides the
    scan as a broadcast; the corpus is read once."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")).withColumn(
        "weight", 1 + F.substring("source", 4, 10).cast("int") % 3
    )
    tot = w.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.col("weight") * F.col("n_docs")).alias("wsum"),
    )
    # no broadcast hints: tot is 1 row and the rate table is
    # |sources| rows — both far under autoBroadcastJoinThreshold, and
    # the repo-wide guard (test_plans) rejects hints on anything not
    # structurally pinned
    r = w.crossJoin(tot).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("weight").cast("long").alias("weight"),
        F.floor(
            100
            * F.least(
                F.lit(1.0),
                0.6 * F.col("n_total") * F.col("weight") / F.col("wsum"),
            )
        )
        .cast("long")
        .alias("pct_kept"),
    )
    kept = (
        docs.join(r.select("source", "pct_kept"), "source")
        .filter(F.col("doc_id") % 100 < F.col("pct_kept"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    from pyspark.sql import Window as W

    f = (
        r.join(kept, "source", "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)).cast("long"))
    )
    return f.select(
        "source",
        "n_docs",
        "weight",
        "pct_kept",
        "n_kept",
        F.round(F.col("n_kept") / F.sum("n_kept").over(W.partitionBy()), 4).alias(
            "achieved_share"
        ),
    )


@spark_query(
    "q_mixture_temperature",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
  FROM documents GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n_docs) AS BIGINT)          AS n_total,
         CAST(SUM(n_docs * n_docs) AS BIGINT) AS n2_sum,
         CAST(COUNT(*) AS BIGINT)             AS k,
         CAST(SUM(n_toks) AS BIGINT)          AS tok_total
  FROM s
),
x AS (SELECT * FROM s CROSS JOIN t),
u AS (
  SELECT source, '0.5' AS tau, n_docs,
         CAST(n_docs AS DOUBLE) * n_docs / n2_sum   AS w,
         CAST(n_docs AS DOUBLE) * n_total / n2_sum  AS boost,
         tok_total
  FROM x
  UNION ALL
  SELECT source, '1', n_docs,
         CAST(n_docs AS DOUBLE) / n_total,
         CAST(1.0 AS DOUBLE),
         tok_total
  FROM x
  UNION ALL
  SELECT source, 'inf', n_docs,
         CAST(1.0 AS DOUBLE) / k,
         CAST(n_total AS DOUBLE) / (k * n_docs),
         tok_total
  FROM x
)
SELECT source, tau, n_docs,
       ROUND(w, 6)             AS weight,
       ROUND(boost, 4)         AS boost,
       ROUND(w * tok_total, 2) AS expected_tokens
FROM u
ORDER BY source, tau
""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-mixture weights — the data-mixing
    primitive LLM corpus assembly actually uses (multilingual /
    multi-source balancing samples source i with probability
    ∝ p_i^(1/τ)): τ<1 SHARPENS toward big sources, τ=1 is
    proportional, τ→∞ is uniform.  Emits, per (source, τ), the
    sampling weight, the boost over proportional sampling (the
    up/down-sampling factor small sources get), and the expected token
    draw at a one-epoch budget — the three numbers a mixture review
    reads.

    Determinism contract: τ is restricted to {0.5, 1, ∞}, whose
    weights are RATIOS OF EXACT INTEGER SUMS (n², n, 1 — no libm
    pow(), which is not ulp-stable cross-runtime; the q_minhash_scurve
    lesson), so Spark and DuckDB compute bit-identical doubles before
    the display rounding.  Shape: one |sources|-row aggregate, one
    1-row totals aggregate joined back (broadcast-sized by
    construction, same pattern as q_corpus_mixture), and a 3-way
    literal τ expansion — at 100 TB the corpus is scanned once for the
    counts and everything downstream is bytes."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_toks"),
    )
    t = s.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.sum(F.col("n_docs") * F.col("n_docs")).cast("bigint").alias("n2_sum"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_toks").cast("bigint").alias("tok_total"),
    )
    # 1-row totals — under autoBroadcastJoinThreshold by construction,
    # no hint needed (repo guard rejects hints on non-structural dims)
    x = s.crossJoin(t)
    nd = F.col("n_docs").cast("double")
    variants = [
        ("0.5", nd * F.col("n_docs") / F.col("n2_sum"),
         nd * F.col("n_total") / F.col("n2_sum")),
        ("1", nd / F.col("n_total"), F.lit(1.0)),
        ("inf", F.lit(1.0) / F.col("k"),
         F.col("n_total").cast("double") / (F.col("k") * F.col("n_docs"))),
    ]
    out = x.select(
        "source",
        "n_docs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(tau).alias("tau"),
                        w.alias("w"),
                        b.alias("boost"),
                        (w * F.col("tok_total")).alias("etok"),
                    )
                    for tau, w, b in variants
                ]
            )
        ).alias("v"),
    )
    return out.select(
        "source",
        F.col("v.tau").alias("tau"),
        "n_docs",
        F.round(F.col("v.w"), 6).alias("weight"),
        F.round(F.col("v.boost"), 4).alias("boost"),
        F.round(F.col("v.etok"), 2).alias("expected_tokens"),
    ).orderBy("source", "tau")


def five_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) for every 5-token shingle — shared by the exact
    decontamination join and its bloom-prefiltered twin
    (operators/bloom.py).

    split() is materialized as a column BEFORE the transform: an
    unresolved expression captured by a higher-order-function lambda is
    re-evaluated per element (split-per-token — measured 4.5x slower
    at sf0.1)."""
    base = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 5
    )
    t = F.col("t")
    grams_col = F.transform(
        F.sequence(F.lit(1), F.size(t) - 4),
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(t, i + j) for j in range(5)],
        ),
    )
    return base.select("doc_id", F.explode(grams_col).alias("gram"))


WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window
WINNOW_B = 131
WINNOW_P = 1000000007
# Document-frequency cap on the inverted index (r8: was a docstring
# promise, made code after the 9x scale point measured 28x wall —
# boilerplate fingerprints shared by d docs fan the self-join out
# d*(d-1)/2 rows EACH, quadratic in corpus growth, and carry no
# near-dup signal).  Fixture max DF is 147 at sf0.1 (measured), so 256
# is the identity on every standard SF and binding only under skew;
# mirrored in the oracle.
WINNOW_DF_CAP = 256


def _winnow_tok_hash(t):
    """Engine-portable token hash over (length, first char, last two
    chars) — shared by q_doc_winnowing and q_winnow_neardup, mirrored
    verbatim in their oracles via WINNOW_TOK_HASH_SQL.

    r10: the original (length, first-char) hash had a ~700-value
    range, so at the 27x scale point DISTINCT tokens collided en
    masse — posting lists filled with false-positive fingerprints and
    the neardup join stepped x6.3 on 3x data (SCALE.md round-10 IV).
    The last-two-chars terms lift the range to ~35k (k-gram space
    ~6e8), which corpus growth disperses over; still pure codegen, no
    engine hash functions.  Zero-length tokens hash to 0 explicitly:
    Spark's ascii('') is 0 but DuckDB's ord('') is -1."""
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) * 1009
        + F.ascii(F.substring(t, 1, 1)) * 31
        + F.ascii(t.substr(F.greatest(F.length(t) - 1, F.lit(1)), F.lit(1))) * 7
        + F.ascii(t.substr(F.length(t), F.lit(1)))
    )


WINNOW_TOK_HASH_SQL = (
    "CASE WHEN LENGTH(t) = 0 THEN 0 ELSE "
    "LENGTH(t) * 1009 + ord(substr(t, 1, 1)) * 31 "
    "+ ord(substr(t, greatest(LENGTH(t) - 1, 1), 1)) * 7 "
    "+ ord(substr(t, LENGTH(t), 1)) END"
)


@spark_query(
    "q_doc_winnowing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
sv AS (
  SELECT doc_id,
         list_transform(ts, t -> {WINNOW_TOK_HASH_SQL}) AS s,
         len(ts) AS n
  FROM toks
),
kg AS (
  SELECT doc_id, n,
         CASE WHEN n >= {WINNOW_K} THEN
           list_transform(range(1, n - {WINNOW_K} + 2),
             i -> (s[i] * {WINNOW_B * WINNOW_B} + s[i+1] * {WINNOW_B} + s[i+2])
                  % {WINNOW_P})
         ELSE [] END AS h
  FROM sv
),
fp AS (
  SELECT doc_id, len(h) AS n_kgrams,
         CASE WHEN len(h) >= {WINNOW_W} THEN
           list_distinct(list_transform(range(1, len(h) - {WINNOW_W} + 2),
             i -> list_aggregate(h[i:i+{WINNOW_W - 1}], 'min')))
         ELSE list_distinct(h) END AS fps
  FROM kg
)
SELECT doc_id,
       CAST(n_kgrams AS INT) AS n_kgrams,
       CAST(len(fps) AS INT) AS n_fingerprints,
       CAST(list_aggregate(fps, 'sum') % {WINNOW_P} AS BIGINT) AS fp_checksum
FROM fp
""",
)
def q_doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the public rolling-hash fingerprinting method): per
    document, hash every K-token gram with a polynomial rolling hash,
    slide a W-wide window over the hash sequence, keep each window's
    MINIMUM, and emit the distinct selected fingerprints.  Guarantees:
    any shared run of >= W+K-1 tokens between two documents shares at
    least one fingerprint — the position-robust, ORDER-SENSITIVE
    complement to q_doc_fingerprint's order-free bag hash.

    Engine-portable arithmetic (no engine hash functions), so the
    fingerprint checksums hash-match DuckDB exactly.  Plan shape: one
    pass of nested array expressions inside codegen — no explode, no
    shuffle until the (absent) final aggregation; at 100 TB each doc's
    fingerprint set is computed where the doc lives, and a dedup join
    on fingerprints is the standard next stage (same banded-join shape
    as q_minhash_lsh)."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.transform(F.split("text", " "), _winnow_tok_hash)
    sv = docs.select("doc_id", s.alias("s"), F.size(s).alias("n"))
    poly = (
        lambda i: (
            F.element_at("s", i) * (WINNOW_B * WINNOW_B)
            + F.element_at("s", i + 1) * WINNOW_B
            + F.element_at("s", i + 2)
        )
        % WINNOW_P
    )
    kg = sv.select(
        "doc_id",
        F.when(
            F.col("n") >= WINNOW_K,
            F.transform(
                F.sequence(F.lit(1), F.col("n") - WINNOW_K + 1), poly
            ),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("h"),
    )
    fps = F.when(
        F.size("h") >= WINNOW_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("h") - WINNOW_W + 1),
                lambda i: F.array_min(F.slice("h", i, WINNOW_W)),
            )
        ),
    ).otherwise(F.array_distinct("h"))
    out = kg.select(
        "doc_id",
        F.size("h").alias("n_kgrams"),
        fps.alias("fps"),
    )
    return out.select(
        "doc_id",
        "n_kgrams",
        F.size("fps").alias("n_fingerprints"),
        (
            F.aggregate("fps", F.lit(0).cast("long"), lambda a, x: a + x)
            % WINNOW_P
        ).alias("fp_checksum"),
    )


@spark_query(
    "q_winnow_neardup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
sv AS (
  SELECT doc_id,
         list_transform(ts, t -> {WINNOW_TOK_HASH_SQL}) AS s,
         len(ts) AS n
  FROM toks
),
kg AS (
  SELECT doc_id, n,
         CASE WHEN n >= {WINNOW_K} THEN
           list_transform(range(1, n - {WINNOW_K} + 2),
             i -> (s[i] * {WINNOW_B * WINNOW_B} + s[i+1] * {WINNOW_B} + s[i+2])
                  % {WINNOW_P})
         ELSE [] END AS h
  FROM sv
),
fp AS (
  SELECT doc_id,
         CASE WHEN len(h) >= {WINNOW_W} THEN
           list_distinct(list_transform(range(1, len(h) - {WINNOW_W} + 2),
             i -> list_aggregate(h[i:i+{WINNOW_W - 1}], 'min')))
         ELSE list_distinct(h) END AS fps
  FROM kg
),
inv AS (SELECT doc_id, UNNEST(fps) AS fpv FROM fp),
invf AS (
  SELECT doc_id, fpv FROM (
    SELECT doc_id, fpv, COUNT(*) OVER (PARTITION BY fpv) AS df FROM inv
  ) WHERE df <= {WINNOW_DF_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM invf a JOIN invf b ON a.fpv = b.fpv AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
""",
)
def q_winnow_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared-run detection via the winnowing inverted
    index — the guarantee-carrying complement to the probabilistic
    MinHash/SimHash stack: any pair emitted here PROVABLY shares >= 2
    selected k-gram fingerprints, and any pair sharing two token runs
    of length >= W+K-1 is guaranteed to appear (the winnowing
    theorem, Schleimer et al. 2003).  This is the plagiarism /
    near-verbatim-overlap detector a training corpus runs after
    fuzzy dedup.

    Plan shape: fingerprints explode into an inverted index
    (doc_id, fp) — the ONLY shuffle key is the 8-byte fingerprint;
    the self-equi-join on fp is bucketed by construction (each
    fingerprint's posting list is tiny for natural text), and the
    >= 2 threshold is a post-join partial count.  No text bodies ever
    shuffle; no all-pairs stage.  Hot fingerprints (boilerplate) are
    the skew knob: a posting list of d docs fans the join out
    d·(d−1)/2 rows, quadratic in corpus growth, so fps with document
    frequency > WINNOW_DF_CAP are DROPPED before the join (window
    count over fpv — the same shuffle key the join uses, so the cap
    reuses the join partitioning).  Identity on every standard SF
    (fixture max DF 147 < 256, hashes unchanged); at the 9× scale
    fixture it cut the wall from 28× to near-linear.  Mirrored in the
    oracle; same design as q_corpus_boilerplate_ngrams' hot-n-gram
    cap."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.transform(F.split("text", " "), _winnow_tok_hash)
    sv = docs.select("doc_id", s.alias("s"), F.size(s).alias("n"))
    poly = (
        lambda i: (
            F.element_at("s", i) * (WINNOW_B * WINNOW_B)
            + F.element_at("s", i + 1) * WINNOW_B
            + F.element_at("s", i + 2)
        )
        % WINNOW_P
    )
    kg = sv.select(
        "doc_id",
        F.when(
            F.col("n") >= WINNOW_K,
            F.transform(F.sequence(F.lit(1), F.col("n") - WINNOW_K + 1), poly),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("h"),
    )
    fps = F.when(
        F.size("h") >= WINNOW_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("h") - WINNOW_W + 1),
                lambda i: F.array_min(F.slice("h", i, WINNOW_W)),
            )
        ),
    ).otherwise(F.array_distinct("h"))
    inv = kg.select("doc_id", F.explode(fps).alias("fpv"))
    wdf = Window.partitionBy("fpv")
    inv = (
        inv.withColumn("df", F.count(F.lit(1)).over(wdf))
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .drop("df")
    )
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fpv") == F.col("b.fpv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@spark_query(
    "q_corpus_token_budget",
    oracle="""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
         1 + (CAST(SUBSTR(source, 4) AS INTEGER) % 3) AS weight
  FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(tokens) AS corpus_tokens,
         SUM(weight * tokens) AS wsum
  FROM per_source
)
SELECT s.source, s.n_docs, s.tokens, CAST(s.weight AS BIGINT) AS weight,
       CAST(FLOOR(0.5 * t.corpus_tokens * (s.weight * s.tokens) * 1.0 / t.wsum)
            AS BIGINT) AS alloc_tokens,
       ROUND(LEAST(4.0,
         FLOOR(0.5 * t.corpus_tokens * (s.weight * s.tokens) * 1.0 / t.wsum)
           * 1.0 / s.tokens), 4) AS epochs,
       CAST(FLOOR(LEAST(4.0,
         FLOOR(0.5 * t.corpus_tokens * (s.weight * s.tokens) * 1.0 / t.wsum)
           * 1.0 / s.tokens) * s.tokens) AS BIGINT) AS tokens_served
FROM per_source s CROSS JOIN tot t
""",
)
def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning — the TRAINING-RUN side of corpus
    curation (q_corpus_mixture plans which documents survive; this
    plans how many TOKENS each source contributes to a fixed training
    budget, including repetition): each source gets a
    weight-proportional share of a budget equal to half the corpus,
    expressed as epochs over that source, with epochs capped at 4
    (repeating data beyond a few epochs stops helping — the
    data-constrained scaling regime of Muennighoff et al. 2023).

    All quantities are exact integers (token counts, weights) until
    the final epoch ratio, so the plan hash-matches across engines.

    Shape: one groupBy(source) over the corpus computes the token
    census (sum of per-row token counts — partial-aggregated, the
    scan's only shuffle), the totals row is a 1-row cross join
    broadcast, and the allocation arithmetic is per-source codegen.
    The output IS the sampling spec a 100 TB training-data job
    executes (epochs < 1 -> subsample rate; epochs > 1 -> repeat
    count), so planning cost is one census pass regardless of
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens"),
        (1 + F.substring(F.first("source"), 4, 10).cast("int") % 3).alias("weight"),
    )
    total = per_source.agg(
        F.sum("tokens").alias("corpus_tokens"),
        F.sum(F.col("weight") * F.col("tokens")).alias("wsum"),
    )
    j = per_source.crossJoin(bcast(total, "1-row total aggregate"))
    alloc = F.floor(
        0.5
        * F.col("corpus_tokens")
        * (F.col("weight") * F.col("tokens"))
        * 1.0
        / F.col("wsum")
    )
    epochs = F.least(F.lit(4.0), alloc * 1.0 / F.col("tokens"))
    return j.select(
        "source",
        "n_docs",
        "tokens",
        F.col("weight").cast("bigint").alias("weight"),
        alloc.cast("bigint").alias("alloc_tokens"),
        F.round(epochs, 4).alias("epochs"),
        F.floor(epochs * F.col("tokens")).cast("bigint").alias("tokens_served"),
    )
