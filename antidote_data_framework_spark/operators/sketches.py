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
        toks.join(F.broadcast(candidates), "tok", "left_semi")
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
