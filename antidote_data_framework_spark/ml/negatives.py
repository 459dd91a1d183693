"""Deterministic negative sampling for implicit-feedback training —
the data-prep step every recommender / contrastive-learning pipeline
needs: for each observed (user, item) positive, draw K unobserved
items as negatives.

Engine-portable by construction: candidates come from a
multiplicative-hash scramble (the same Knuth-constant trick as the
stratified sampler, curation.py), not an RNG, so ANY engine —
Spark, DuckDB, a future backfill job — regenerates the identical
negative set.  Observed pairs are removed with an anti-join (never a
driver-side set), so the plan is: distinct → explode(K) → hash →
anti-join → distinct, all shuffle-on-user_id co-partitioned work.

At 100 TB: |positives|·K candidate rows is the only expansion (K=3);
the anti-join shuffles on (user_id, item) — same key as the positives
dedup, so AQE reuses the exchange.  Hash-overflow headroom is
documented inline (user_id is reduced mod 2^31 first; 2^31·Knuth ≈
5.7e18 < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..sources import load_table
from .recsys_data import RATINGS_CTE, ratings_df

_KNUTH = 2654435761


@spark_query(
    "q_negative_sampling",
    oracle=f"""
WITH {RATINGS_CTE.strip()},
pos AS (SELECT DISTINCT user_id, item_id FROM ratings),
np AS (SELECT MAX(p_partkey) AS max_item FROM part),
ks AS (SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2),
cand AS (
  SELECT pos.user_id,
         1 + ((pos.user_id % 2147483647) * {_KNUTH}
          + pos.item_id * 97003 + ks.k * 1000003) % np.max_item AS neg_item
  FROM pos CROSS JOIN np CROSS JOIN ks
)
SELECT DISTINCT c.user_id, c.neg_item
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM pos p
  WHERE p.user_id = c.user_id AND p.item_id = c.neg_item
)
""",
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=3 deterministic negatives per positive pair, minus anything
    the user actually interacted with (anti-join), deduplicated.
    Downstream training unions these (label 0) with the positives
    (label 1) — emitted as bare pairs so the consumer picks labels."""
    pos = ratings_df(spark, sf_dir).select("user_id", "item_id").distinct()
    # Candidates stay in the VALID 1-based item domain (r4 ADVICE:
    # `hash % (max+1)` could emit neg_item=0, a nonexistent item):
    # 1 + hash % max(p_partkey) covers exactly [1, max_item].
    n_items = (
        load_table(spark, sf_dir, "part")
        .agg(F.max("p_partkey").alias("max_item"))
    )
    cand = (
        pos.crossJoin(bcast(n_items, "1-row item-count agg"))
        .withColumn("k", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
        .select(
            "user_id",
            (
                F.lit(1)
                + (
                    (F.col("user_id") % 2147483647) * F.lit(_KNUTH)
                    + F.col("item_id") * 97003
                    + F.col("k") * 1000003
                )
                % F.col("max_item")
            ).alias("neg_item"),
        )
    )
    return (
        cand.alias("c")
        .join(
            pos.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.neg_item") == F.col("p.item_id")),
            "left_anti",
        )
        .distinct()
    )
