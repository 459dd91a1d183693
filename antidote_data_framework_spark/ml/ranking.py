"""Ranking-quality evaluation for the recommender surface:
precision@k, recall@k, NDCG@k and MRR@k over the held-out test split.

The reference evaluates its recommender with matrix-level error and
social-metric objectives (RMSE, polarization, fairness — O-33..O-39);
a production recommender additionally gates on RANKING quality over a
holdout.  This operator closes that gap with the standard top-k
metrics, computed entirely as one window + two aggregations — no dense
matrix, no per-user loop.

Determinism posture (the repo's float discipline, README §Determinism):

- the per-user ranking is a TOTAL order (pred DESC, item_id ASC) —
  pred values are bit-identical across engines because the predictor
  is the same IEEE expression both sides (O-33..O-39 hash-match it);
- the discount weights 1/log2(pos+1) are NOT evaluated with log2()
  at query time (libm last-ulp differences across engines) but baked
  in as 12-dp DECIMAL literals, identical in both plans;
- per-user DCG sums those exact decimals (order-independent), and the
  cross-user mean goes through DECIMAL(28,12) accumulation — the same
  posture q_graph_pagerank uses for its float fixpoint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import spark_query
from .recsys_data import RATINGS_CTE, BIAS_MODEL_CTES, bias_predictions, is_train

_K = 5
_REL_MIN = 4.0  # test rating >= 4 counts as relevant

# 1/log2(pos+1) for pos = 1..k, quantized once to 12 dp so both
# engines sum identical exact decimals.
_DISCOUNT_12DP = [format(1.0 / math.log2(p + 1), ".12f") for p in range(1, _K + 1)]
# ideal DCG after m relevant items (m = 1..k), as 12-dp decimal sums
_IDCG_12DP = [
    format(sum(1.0 / math.log2(j + 1) for j in range(1, m + 1)), ".12f")
    for m in range(1, _K + 1)
]
# reciprocal-rank literals 1/r, r = 1..k
_RECIP_12DP = [format(1.0 / r, ".12f") for r in range(1, _K + 1)]


def _sql_case(expr: str, lits: list[str]) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN CAST({v} AS DECIMAL(18,12))" for i, v in enumerate(lits)
    )
    return f"CASE ({expr}) {whens} ELSE CAST(0 AS DECIMAL(18,12)) END"


def _ranking_oracle() -> str:
    return f"""
WITH {RATINGS_CTE.strip()},
{BIAS_MODEL_CTES.strip()},
ranked AS (
  SELECT user_id,
         CASE WHEN rating >= {_REL_MIN} THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY pred DESC, item_id ASC) AS pos
  FROM pred
  WHERE NOT ((user_id * 31 + item_id) % 10 < 8)
),
per_user AS (
  SELECT user_id,
         SUM(rel) AS t,
         SUM(CASE WHEN rel = 1 AND pos <= {_K} THEN 1 ELSE 0 END) AS hits,
         SUM(CASE WHEN rel = 1 AND pos <= {_K}
                  THEN {_sql_case('pos', _DISCOUNT_12DP)}
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg,
         MIN(CASE WHEN rel = 1 THEN pos END) AS first_rel
  FROM ranked
  GROUP BY user_id
),
scored AS (
  SELECT t, hits,
         CAST(dcg AS DOUBLE)
           / CAST({_sql_case(f'CASE WHEN t < {_K} THEN t ELSE {_K} END', _IDCG_12DP)}
                  AS DOUBLE) AS ndcg_u,
         CASE WHEN first_rel <= {_K}
              THEN CAST({_sql_case('first_rel', _RECIP_12DP)} AS DOUBLE)
              ELSE 0.0 END AS mrr_u
  FROM per_user
  WHERE t >= 1
)
SELECT COUNT(*) AS n_users,
       CAST(ROUND(CAST(SUM(CAST(hits AS DECIMAL(28,12))) AS DOUBLE)
                  / ({_K} * COUNT(*)), 6) AS DOUBLE) AS precision_at_k,
       CAST(ROUND(CAST(SUM(CAST(CAST(hits AS DOUBLE) / t AS DECIMAL(28,12)))
                       AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS recall_at_k,
       CAST(ROUND(CAST(SUM(CAST(ndcg_u AS DECIMAL(28,12))) AS DOUBLE)
                  / COUNT(*), 6) AS DOUBLE) AS ndcg_at_k,
       CAST(ROUND(CAST(SUM(CAST(mrr_u AS DECIMAL(28,12))) AS DOUBLE)
                  / COUNT(*), 6) AS DOUBLE) AS mrr_at_k
FROM scored
"""


@spark_query("q_rec_eval_ranking", oracle=_ranking_oracle())
def q_rec_eval_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ranking metrics (k=5) of the bias-model recommender on
    the held-out test cells: mean precision@5, recall@5, NDCG@5 and
    MRR@5 over users with at least one relevant holdout item.

    Plan: one window (rank test items per user by prediction), one
    groupBy(user) computing hits / relevant-count / decimal DCG /
    first-relevant-rank simultaneously, one global aggregate.  The
    rank window partitions by user — ranking evaluation at 100 TB is
    embarrassingly parallel per user and never materializes more state
    than a user's candidate list; the global mean moves one row per
    user.  See module docstring for the cross-engine float posture."""
    pred = bias_predictions(spark, sf_dir)
    test = pred.filter(~is_train(F.col("user_id"), F.col("item_id")))
    w = Window.partitionBy("user_id").orderBy(F.desc("pred"), F.asc("item_id"))
    ranked = test.select(
        "user_id",
        F.when(F.col("rating") >= _REL_MIN, 1).otherwise(0).alias("rel"),
        F.row_number().over(w).alias("pos"),
    )

    def dec_lookup(idx, lits: list[str]):
        arr = F.array(*[F.lit(v).cast("decimal(18,12)") for v in lits])
        return F.element_at(arr, idx.cast("int"))

    zero_dec = F.lit("0").cast("decimal(18,12)")
    in_top = (F.col("rel") == 1) & (F.col("pos") <= _K)
    per_user = ranked.groupBy("user_id").agg(
        F.sum("rel").alias("t"),
        F.sum(F.when(in_top, 1).otherwise(0)).alias("hits"),
        F.sum(
            F.when(in_top, dec_lookup(F.col("pos"), _DISCOUNT_12DP)).otherwise(zero_dec)
        ).alias("dcg"),
        F.min(F.when(F.col("rel") == 1, F.col("pos"))).alias("first_rel"),
    )
    scored = per_user.filter(F.col("t") >= 1).select(
        "hits",
        "t",
        (
            F.col("dcg").cast("double")
            / dec_lookup(F.least(F.col("t"), F.lit(_K)), _IDCG_12DP).cast("double")
        ).alias("ndcg_u"),
        F.when(
            F.col("first_rel") <= _K,
            dec_lookup(F.col("first_rel"), _RECIP_12DP).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr_u"),
    )

    def dec_mean(col, denom):
        return F.round(
            F.sum(col.cast("decimal(28,12)")).cast("double") / denom, 6
        ).cast("double")

    n = F.count(F.lit(1))
    return scored.agg(
        n.alias("n_users"),
        dec_mean(F.col("hits"), _K * n).alias("precision_at_k"),
        dec_mean(F.col("hits").cast("double") / F.col("t"), n).alias("recall_at_k"),
        dec_mean(F.col("ndcg_u"), n).alias("ndcg_at_k"),
        dec_mean(F.col("mrr_u"), n).alias("mrr_at_k"),
    )
