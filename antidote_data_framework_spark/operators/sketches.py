"""Heavy hitters via Misra-Gries sketching with exact verification —
the approximate-prune / exact-verify pattern the engine uses everywhere
(MinHash bands -> signature check, IVF probe -> exact cosine), applied
to frequency estimation.

The two-phase design is what makes a sketch usable in a correctness-
gated pipeline: phase 1 runs a Misra-Gries(k) summary per partition
(streaming one pass, bounded memory k entries, no shuffle), whose
merged candidate set PROVABLY contains every token with true frequency
> n/k; phase 2 exactly recounts ONLY the candidates (a semi join —
candidate set is <= k x partitions entries, broadcastable).  The final
answer is therefore EXACT — and hash-matches a plain GROUP BY/HAVING
oracle — while the full-vocabulary shuffle is replaced by a
candidate-only one.  At 100 TB with a trillion-token corpus this is
the difference between shuffling the corpus vocabulary and shuffling
a few thousand candidate rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table

_MG_K = 400  # per-partition sketch width; threshold is n_tokens / _MG_K


def _mg_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries(k) over this partition's token stream.

    Classic decrement-counter summary: k counters; a token not among
    them decrements ALL counters (here amortized via batch value_counts
    and a single subtraction).  Surviving entries are the partition's
    candidates; per-partition counts are lower bounds, discarded after
    the exact recount."""
    counters: dict[str, int] = {}
    n_seen = 0
    for pdf in batches:
        vc = pdf["tok"].value_counts()
        n_seen += int(vc.sum())
        for tok, cnt in vc.items():
            counters[tok] = counters.get(tok, 0) + int(cnt)
        if len(counters) > _MG_K:
            # decrement by the (len-k)-th largest count so at most k
            # survive — the batched form of the one-at-a-time decrement
            cuts = sorted(counters.values(), reverse=True)
            cut = cuts[_MG_K] if len(cuts) > _MG_K else 0
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    yield pd.DataFrame({"tok": list(counters.keys()), "n_part": [n_seen] * len(counters)})


@spark_query(
    "q_heavy_hitters",
    oracle="""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
),
n AS (SELECT COUNT(*) AS n_tokens FROM toks)
SELECT tok, COUNT(*) AS freq,
       CAST(ROUND(COUNT(*) * 1.0 / (SELECT n_tokens FROM n), 6) AS DOUBLE) AS frac
FROM toks
GROUP BY tok
HAVING COUNT(*) > (SELECT n_tokens FROM n) / 400
ORDER BY freq DESC, tok
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: every token with frequency > n/400, with
    exact counts — via per-partition Misra-Gries pruning + exact
    candidate recount (see module docstring; the oracle is the direct
    GROUP BY/HAVING because the sketch+verify pipeline is exact by
    construction — that equivalence is the point being verified).

    Dataflow: tokens explode JVM-side; the MG pass is one Arrow-batched
    mapInPandas with NO shuffle (sketch state lives inside the
    partition iterator); candidates dedup to a broadcastable set; the
    exact recount aggregates only semi-joined tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    candidates = (
        toks.mapInPandas(_mg_partials, schema="tok STRING, n_part BIGINT")
        .select("tok")
        .distinct()
    )
    n_tokens = toks.count()
    counted = (
        toks.join(bcast(candidates, "LIMIT-bounded candidate head"), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counted.filter(F.col("freq") > F.lit(n_tokens) / F.lit(_MG_K))
        .select(
            "tok",
            "freq",
            F.round(F.col("freq") * 1.0 / F.lit(n_tokens), 6)
            .cast("double")
            .alias("frac"),
        )
        .orderBy(F.desc("freq"), F.asc("tok"))
    )


# Count-min sketch geometry: d independent hash rows x w counters.
# Hashes are explicit affine maps mod a prime so BOTH engines compute
# the identical sketch (engine-native hash() functions differ).
CMS_W = 64
CMS_P = 1_000_003
CMS_ROWS = ((31, 7), (131, 13), (1031, 29), (8191, 47))  # (a, b) per row


def _cms_oracle() -> str:
    rows = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS r, ((user_id * {a} + {b}) % {CMS_P}) % {CMS_W} AS col,"
        f" user_id FROM events"
        for i, (a, b) in enumerate(CMS_ROWS)
    )
    return f"""
WITH hashed AS (
{rows}
),
sketch AS (
  SELECT r, col, CAST(COUNT(*) AS BIGINT) AS c
  FROM hashed GROUP BY r, col
),
truth AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, true_count FROM truth
  ORDER BY true_count DESC, user_id LIMIT 10
),
probes AS (
{_cms_probe_rows()}
),
est AS (
  SELECT p.user_id, MIN(s.c) AS cms_estimate
  FROM probes p JOIN sketch s ON s.r = p.r AND s.col = p.col
  GROUP BY p.user_id
)
SELECT t.user_id, t.true_count, e.cms_estimate,
       CAST(e.cms_estimate - t.true_count AS BIGINT) AS overcount
FROM top t JOIN est e ON t.user_id = e.user_id
"""


def _cms_probe_rows() -> str:
    return "\n  UNION ALL\n".join(
        f"  SELECT {i} AS r, ((user_id * {a} + {b}) % {CMS_P}) % {CMS_W} AS col,"
        f" user_id FROM (SELECT user_id, COUNT(*) AS c FROM events"
        f" GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10)"
        for i, (a, b) in enumerate(CMS_ROWS)
    )


@spark_query("q_countmin_sketch", oracle=_cms_oracle())
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d=4 x w=64 counter matrix over the event
    user-id stream, probed for the top-10 users — estimate =
    MIN over the d hashed counters, always >= true count (one-sided
    error).  Output shows true vs estimated count and the overcount,
    making the sketch's bias observable and hash-verifiable.

    Why it earns a place next to Misra-Gries (q_heavy_hitters) and
    HLL (q_reagg_hll_sketch): CMS is the MERGEABLE point-frequency
    sketch — the d x w matrix is a fixed 4x64 grid of BIGINTs
    regardless of stream size, partial sketches from any partitioning
    add cell-wise, and a point query costs d lookups.  At 100 TB the
    groupBy(r, col) reduces map-side to <= d*w partials per task:
    the shuffle moves O(d*w*tasks) counters, never O(rows).

    Determinism: the affine hashes ((id*a + b) % p) % w are exact
    integer arithmetic, identical in both engines by construction
    (engine-native hash() builtins differ, so none are used).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")

    # One scan emitting all d hash rows per event (r12, guide §1.2):
    # the old 4-branch unionAll ran the events scan once PER HASH ROW.
    # Same (r, col, user_id) multiset — the affine maps are unchanged
    # — so the sketch counts are identical.
    def hash_rows(of):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        ((of * a + b) % CMS_P % CMS_W).alias("col"),
                    )
                    for i, (a, b) in enumerate(CMS_ROWS)
                ]
            )
        )

    hashed = ev.select(hash_rows(F.col("user_id")).alias("h"), "user_id").select(
        F.col("h.r").alias("r"), F.col("h.col").alias("col"), "user_id"
    )
    sketch = hashed.groupBy("r", "col").agg(F.count(F.lit(1)).alias("c"))

    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    # The 10-row top table feeds the d probe branches AND the final
    # join — five consumers, each of which re-ran the full groupBy +
    # global TakeOrdered before this checkpoint (before plan: 18 scan
    # nodes; guide §5).
    top = (
        truth.orderBy(F.col("true_count").desc(), "user_id")
        .limit(10)
        .localCheckpoint()
    )

    probes = top.select(hash_rows(F.col("user_id")).alias("h"), "user_id").select(
        F.col("h.r").alias("r"), F.col("h.col").alias("col"), "user_id"
    )
    est = (
        probes.join(sketch, ["r", "col"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return top.join(est, "user_id").select(
        "user_id",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).cast("long").alias("overcount"),
    )


# KMV (k minimum values / bottom-k) distinct sketch geometry.  The
# affine hash is the same explicit-arithmetic discipline as CMS_ROWS:
# both engines compute the identical integer hash, so the sketch —
# and the estimate — are bit-identical by construction.
KMV_K = 128
KMV_P = 1_000_003
KMV_A = 2654435761  # Knuth multiplicative constant
KMV_B = 97003


@spark_query(
    "q_kmv_distinct_sketch",
    oracle=f"""
WITH keyed AS (
  SELECT o_orderstatus AS grp, o_orderkey AS key FROM orders
  UNION ALL
  SELECT '__all__' AS grp, o_orderkey AS key FROM orders
),
hashed AS (
  SELECT DISTINCT grp, (key * {KMV_A} + {KMV_B}) % {KMV_P} AS h
  FROM keyed
),
ranked AS (
  SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed
),
sketch AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS h_k
  FROM ranked WHERE rn <= {KMV_K} GROUP BY grp
),
truth AS (
  SELECT grp, CAST(COUNT(DISTINCT key) AS BIGINT) AS true_distinct
  FROM keyed GROUP BY grp
),
est AS (
  SELECT s.grp, s.n_kept, t.true_distinct,
         CASE WHEN s.n_kept < {KMV_K} THEN CAST(s.n_kept AS DOUBLE)
              ELSE ({KMV_K} - 1.0) * {KMV_P} / s.h_k END AS kmv_est
  FROM sketch s JOIN truth t ON s.grp = t.grp
)
SELECT grp, n_kept, true_distinct,
       CAST(ROUND(kmv_est, 4) AS DOUBLE) + 0.0 AS kmv_estimate,
       CAST(ROUND(ABS(kmv_est - true_distinct) / true_distinct, 4)
            AS DOUBLE) + 0.0 AS rel_error
FROM est
ORDER BY grp
""",
)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch over order keys, per
    order status plus a merged ``__all__`` row — the third mergeable
    sketch in the family (Misra-Gries: heavy hitters; CMS: point
    frequency; KMV: cardinality).  Estimate = ``(k-1)/h_(k)`` on the
    k-th smallest normalized hash; groups holding fewer than k
    distinct hashes take the exact path (the sketch IS the value
    set), so both estimator branches are exercised: the small 'P'
    status group is exact, the big groups estimate.

    Why KMV next to HLL (q_reagg_hll_sketch): KMV's k-min set is a
    UNION-mergeable sample of the key space — merging partials is
    "union then re-take k smallest", which is exactly what the
    per-group window below computes over per-partition partials
    after the map-side DISTINCT; and unlike HLL the sketch supports
    set INTERSECTION estimates downstream.  At 100 TB the bottom-k
    per group flows through partial TakeOrdered aggregation
    (k-bounded state per task), never a full sort: the window here
    ranks an already hash-DISTINCT, group-bounded set.

    Determinism: integer affine hashes identical in both engines;
    the only doubles are two final ratios of exact ints, rounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    # Two-branch unionAll, each branch its own scan (r13: REVERTED the
    # r12 single-scan explode fold per the r12 VERDICT #8 criterion —
    # the 27x A/B read the explode shape consistently SLOWER, old warm
    # walls 2.45-2.92 s vs new 3.58-4.44 s, with shuffle write 64.3 ->
    # 86.5 MB: the Generate node breaks the scan->project codegen span
    # and defeats the map-side partial DISTINCT's dedup locality,
    # which costs more than the second columnar scan saves at every
    # measured point).
    keyed = orders.select(
        F.col("o_orderstatus").alias("grp"), F.col("o_orderkey").alias("key")
    ).unionAll(
        orders.select(
            F.lit("__all__").alias("grp"), F.col("o_orderkey").alias("key")
        )
    )
    hashed = keyed.select(
        "grp", ((F.col("key") * KMV_A + KMV_B) % KMV_P).alias("h")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("h_k"),
        )
    )
    truth = keyed.groupBy("grp").agg(
        F.countDistinct("key").cast("long").alias("true_distinct")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise((KMV_K - 1.0) * KMV_P / F.col("h_k"))
    return (
        sketch.join(truth, "grp")
        .select(
            "grp",
            "n_kept",
            "true_distinct",
            (F.round(est, 4).cast("double") + F.lit(0.0)).alias("kmv_estimate"),
            (
                F.round(
                    F.abs(est - F.col("true_distinct"))
                    / F.col("true_distinct"),
                    4,
                ).cast("double")
                + F.lit(0.0)
            ).alias("rel_error"),
        )
        .orderBy("grp")
    )
