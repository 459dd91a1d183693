"""ALS metamorphic check (SURVEY §5.2.3): more ALS iterations must not
make held-out RMSE worse (RMSE@10 <= RMSE@1 + slack)."""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS
from pyspark.sql import functions as F

from antidote_data_framework_spark.ml.recsys_data import is_train, ratings_df


def _rmse(spark, sf_dir, max_iter: int) -> float:
    r = ratings_df(spark, sf_dir)
    flag = is_train(F.col("user_id"), F.col("item_id"))
    als = ALS(
        userCol="user_id", itemCol="item_id", ratingCol="rating",
        rank=10, regParam=0.1, maxIter=max_iter, seed=42,
        coldStartStrategy="drop",
    )
    model = als.fit(r.filter(flag))
    preds = model.transform(r.filter(~flag))
    return RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    ).evaluate(preds)


def test_more_iterations_do_not_hurt_rmse(spark, sf_dir):
    assert _rmse(spark, sf_dir, 10) <= _rmse(spark, sf_dir, 1) + 1e-6
