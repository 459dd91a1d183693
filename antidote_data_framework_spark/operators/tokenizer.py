"""Tokenizer construction: byte-pair-encoding merge learning over the
corpus word-frequency table — the vocabulary-building stage of an LLM
data pipeline, run as a deterministic distributed loop.

BPE trains on the WORD-FREQUENCY table, not the corpus: after one
corpus-sized aggregation (word -> count), every merge iteration works
on vocabulary-sized data (thousands of rows at any corpus size) —
which is why a 100 TB corpus can learn merges interactively.  Each
iteration: count weighted adjacent symbol pairs, pick the argmax
(count desc, pair asc tie-break), fuse that pair in every word's
symbol string.  The fuse uses plain string replace on a space-
delimited, space-padded symbol representation — greedy left-to-right
non-overlapping in both engines, so the learned merge tables are
bit-identical and the whole loop hash-matches an unrolled-CTE oracle
(the same unrolling discipline as q_graph_pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table

_BPE_ITERS = 3


def _bpe_oracle_sql() -> str:
    prelude = """
WITH words AS (
  SELECT tok, COUNT(*) AS c,
         ROW_NUMBER() OVER (ORDER BY tok) AS wid
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok
),
w0 AS (
  SELECT wid, ' ' || trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) || ' ' AS r, c
  FROM words
)"""
    parts = []
    for t in range(_BPE_ITERS):
        parts.append(
            f"""s{t} AS (
  SELECT wid, c, u.s, u.i
  FROM w{t},
       LATERAL (SELECT UNNEST(string_split(trim(r), ' ')) AS s,
                       generate_subscripts(string_split(trim(r), ' '), 1) AS i) u
),
p{t} AS (
  SELECT a.s || ' ' || b.s AS pair, SUM(a.c) AS pc
  FROM s{t} a JOIN s{t} b ON a.wid = b.wid AND a.i + 1 = b.i
  GROUP BY 1
),
best{t} AS (SELECT pair, pc FROM p{t} ORDER BY pc DESC, pair LIMIT 1),
w{t + 1} AS (
  SELECT wid,
         replace(r, ' ' || (SELECT pair FROM best{t}) || ' ',
                 ' ' || replace((SELECT pair FROM best{t}), ' ', '') || ' ') AS r,
         c
  FROM w{t}
)"""
        )
    final = " UNION ALL ".join(
        f"SELECT {t} AS iteration, pair, replace(pair, ' ', '') AS merged,"
        f" CAST(pc AS BIGINT) AS pair_count FROM best{t}"
        for t in range(_BPE_ITERS)
    )
    return prelude + "," + ",".join(parts) + "\n" + final + "\nORDER BY iteration"


# One BPE merge-learning run per (session, sf_dir) — q_bpe_merges and
# q_bpe_encode both need the identical loop output (the final vocab
# symbol strings + the learned merge list), and each used to re-pay
# the corpus aggregation plus the 3-iteration argmax/fuse chain.
# Same registry pattern as neighbors_cf._SIMS_CACHE; cleared between
# bench sweeps by session.clear_derived_caches so sweeps start cold.
_BPE_CACHE: dict[str, tuple] = {}


def _learn_bpe(spark: SparkSession, sf_dir: str):
    """Run the merge-learning loop; returns (vocab, learned): vocab
    (tok, r, c) carries each word's FINAL space-delimited symbol
    string after all merges (cached per (session, sf_dir) — see
    ``_BPE_CACHE``), learned is the [(iteration, pair, merged, count)]
    list."""
    key = f"{id(spark)}:{sf_dir}"
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = words.select(
        "tok",
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace("tok", "(.)", "$1 ")),
            F.lit(" "),
        ).alias("r"),
        "c",
    ).cache()
    learned = []
    for t in range(_BPE_ITERS):
        syms = F.split(F.trim(F.col("r")), " ")
        pairs = w.select(
            "c",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("c").alias("pc"))
            .orderBy(F.desc("pc"), F.asc("pair"))
            .first()
        )
        merged = best["pair"].replace(" ", "")
        learned.append((t, best["pair"], merged, int(best["pc"])))
        w_next = w.select(
            "tok",
            F.replace(
                F.col("r"), F.lit(f" {best['pair']} "), F.lit(f" {merged} ")
            ).alias("r"),
            "c",
        ).cache()
        # materialize the child BEFORE dropping the parent — unpersisting
        # first would force every iteration to recompute the whole chain
        # from the corpus scan (measured 32 s -> 4 s at sf0.001)
        w_next.count()
        w.unpersist()
        w = w_next
    _BPE_CACHE[key] = (w, learned)
    return _BPE_CACHE[key]


@spark_query("q_bpe_merges", oracle=_bpe_oracle_sql())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges of the corpus (see module
    docstring).  Emits one row per iteration: the merged pair, the
    fused symbol, and its weighted frequency.

    The Spark loop mirrors the oracle's unrolled CTEs: the argmax pair
    is a 1-row collect per iteration (driver state bounded by the
    merge count, like the IVF centroid pull); the fuse is a map-only
    string replace over the vocabulary table.  Pair counting explodes
    each word's symbols once per iteration — vocabulary-sized work.

    Consecutive-repeat semantics: ' l l l ' fuses greedily
    left-to-right (one 'll' + lone 'l'), identical to replace() in
    DuckDB — canonical BPE's count-then-merge-all-positions with the
    same greedy order."""
    _vocab, learned = _learn_bpe(spark, sf_dir)
    # NOTE: _vocab stays cached for q_bpe_encode (see _BPE_CACHE);
    # clear_derived_caches unpersists it between bench sweeps.
    return spark.createDataFrame(
        learned, "iteration INT, pair STRING, merged STRING, pair_count BIGINT"
    )


def _bpe_encode_oracle_sql() -> str:
    base = _bpe_oracle_sql()
    # reuse the merge-learning CTE chain; drop its final SELECT and
    # extend with the vocabulary-encode + per-doc rollup
    cut = base.index("SELECT 0 AS iteration")
    prelude = base[:cut].rstrip()
    return (
        prelude
        + f"""
, enc AS (
  SELECT w.tok, len(string_split(trim(f.r), ' ')) AS n_sym
  FROM w{_BPE_ITERS} f JOIN words w ON w.wid = f.wid
),
dtoks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
)
SELECT d.doc_id,
       COUNT(*)                           AS n_tokens,
       CAST(SUM(LENGTH(d.tok)) AS BIGINT) AS n_chars,
       CAST(SUM(e.n_sym) AS BIGINT)       AS n_symbols,
       CAST(ROUND(SUM(LENGTH(d.tok)) * 1.0 / SUM(e.n_sym), 6) AS DOUBLE)
         AS compression
FROM dtoks d JOIN enc e ON e.tok = d.tok
GROUP BY d.doc_id
ORDER BY d.doc_id
"""
    )


@spark_query("q_bpe_encode", oracle=_bpe_encode_oracle_sql())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned BPE merges — the consumer
    side of q_bpe_merges, and the token-budget measurement an LLM
    pipeline runs after vocabulary construction: per document, the
    whitespace-token count, the pre-merge symbol count (= characters),
    the post-merge symbol count, and the compression ratio.

    The key structural point (same at 100 TB): documents are NEVER
    re-tokenized symbol-by-symbol — the merge loop already produced
    the encoded form of every VOCABULARY word, so encoding the corpus
    is one join of exploded tokens against the vocabulary-sized encode
    table plus a per-doc sum.  Corpus-sized work is one explode + one
    aggregation; every merge-dependent computation stays
    vocabulary-sized (at scale the encode table is broadcast — a
    vocabulary is MBs at any corpus size)."""
    vocab, _learned = _learn_bpe(spark, sf_dir)
    enc = vocab.select("tok", F.size(F.split(F.trim("r"), " ")).alias("n_sym"))
    docs = load_table(spark, sf_dir, "documents")
    dtoks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return (
        dtoks.join(enc, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.length("tok")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_symbols"),
            F.round(F.sum(F.length("tok")) * 1.0 / F.sum("n_sym"), 6)
            .cast("double")
            .alias("compression"),
        )
        .orderBy("doc_id")
    )
