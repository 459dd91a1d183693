"""Antidote-data generation — SURVEY.md §2A O-42/O-43.

The reference's headline algorithm (paper §4, Algorithm 1): append a
small budget of k synthetic user rows X̃ to the ratings matrix and
optimize their values by projected gradient descent so a societal
objective (here: polarization, §5.1) improves after retraining.

Spark-first decomposition (SURVEY §1.1 D5, §3.2):

- X̃ is k×m with k ≈ 1% of users — driver-local numpy BY DESIGN;
  state that fits on the driver stays on the driver.
- everything that scales with DATA is distributed: ALS retraining
  (MLlib), per-item prediction statistics (DataFrame aggs collected as
  m-row summaries), and prediction serving.
- the gradient uses the paper's fixed-V linearization: for fixed item
  factors V, ridge-solved predictions are LINEAR in the ratings,
  X̂ = X̃·B(V) with B = V(VᵀV+λI)⁻¹Vᵀ, so ∂R/∂X̃ is closed-form —
  no differentiating through the ALS iteration.
- at 100 TB (m too large for the driver), the same math shards by
  item block: B·v products become applyInPandas over itemFactors,
  identical formulas per block; nothing in the algebra requires a
  dense m×m B (B = V·M·Vᵀ is applied as three skinny products).

The numpy core below is golden-tested against finite differences in
``tests/test_antidote_numpy.py`` (SURVEY §5.2).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from .recsys_data import ratings_df

RATING_LO, RATING_HI = 1.0, 5.0


# ---- numpy core (small k×m state; golden-tested) ---------------------------


def ridge_hat_factor(V: np.ndarray, lam: float) -> np.ndarray:
    """M = (VᵀV + λI)⁻¹ — the r×r core of B(V) = V·M·Vᵀ [paper §4].

    B itself (m×m) is never materialized; callers apply V·M·Vᵀ as
    three skinny products, which is also the item-block-shardable
    form."""
    r = V.shape[1]
    return np.linalg.inv(V.T @ V + lam * np.eye(r))


def predict_antidote(X_tilde: np.ndarray, V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """X̂ = X̃·B(V) = ((X̃·V)·M)·Vᵀ — predictions are linear in the
    antidote ratings for fixed V [paper §4]."""
    return (X_tilde @ V) @ M @ V.T


def polarization_np(X_hat: np.ndarray) -> float:
    """R_pol = (1/(k·m))·Σ_j Σ_i (x̂_ij − mean_i(x̂_ij))² — the O(n)
    variance form of the paper's pairwise definition [§5.1]."""
    centered = X_hat - X_hat.mean(axis=0, keepdims=True)
    return float((centered**2).sum() / X_hat.size)


def polarization_grad(X_tilde: np.ndarray, V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """∂R_pol/∂X̃ for X̂ = X̃·B: (2/(k·m))·(X̂ − colmean(X̂))·Bᵀ,
    applied without materializing B (B is symmetric)."""
    X_hat = predict_antidote(X_tilde, V, M)
    G_hat = (2.0 / X_hat.size) * (X_hat - X_hat.mean(axis=0, keepdims=True))
    return ((G_hat @ V) @ M) @ V.T


def antidote_step(
    X_tilde: np.ndarray, V: np.ndarray, lam: float, eta: float
) -> np.ndarray:
    """One projected-gradient descent step on the polarization of the
    antidote block's own predictions, clipped back into the rating box
    [paper §4, Algorithm 1]."""
    M = ridge_hat_factor(V, lam)
    stepped = X_tilde - eta * polarization_grad(X_tilde, V, M)
    return np.clip(stepped, RATING_LO, RATING_HI)


def _det_init(k: int, m: int) -> np.ndarray:
    """Deterministic antidote init via modulo arithmetic (no RNG)."""
    u = np.arange(k)[:, None]
    j = np.arange(m)[None, :]
    return (1 + (u * 7 + j * 13) % 5).astype(np.float64)


def _det_factors(m: int, rank: int) -> np.ndarray:
    """Deterministic stand-in item-factor matrix for the unit step."""
    j = np.arange(m)[:, None]
    f = np.arange(rank)[None, :]
    return (((j + 1) * 7 + (f + 1) * 13) % 11) / 11.0 - 0.5


@spark_query("q_antidote_step")  # rows-only: golden-tested vs numpy in tests/
def q_antidote_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One antidote projected-gradient step (k=5 users × 20 items,
    rank-4 fixed V, λ=0.1), deterministic init — emits the before/after
    ratings and the gradient for every antidote cell."""
    k, m, rank, lam, eta = 5, 20, 4, 0.1, 5.0
    X0 = _det_init(k, m)
    V = _det_factors(m, rank)
    M = ridge_hat_factor(V, lam)
    grad = polarization_grad(X0, V, M)
    X1 = np.clip(X0 - eta * grad, RATING_LO, RATING_HI)
    rows = [
        (int(u), int(j), float(X0[u, j]), round(float(grad[u, j]), 6), round(float(X1[u, j]), 4))
        for u in range(k)
        for j in range(m)
    ]
    return spark.createDataFrame(
        rows,
        "antidote_user INT, item_idx INT, rating_before DOUBLE, grad DOUBLE, rating_after DOUBLE",
    )


@spark_query("q_antidote_loop")  # rows-only: iterative ALS retraining
def q_antidote_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full antidote loop [paper §4, Alg.1]: init X̃ → repeat(retrain
    ALS on X∪X̃ → measure original-user polarization → fixed-V gradient
    step on X̃ → project) → emit the metric trajectory.

    Distribution contract per iteration:
      - retrain: MLlib ALS on the combined ratings (distributed);
      - metric: polarization of ORIGINAL users' predictions over their
        observed cells — a groupBy(item).var_pop aggregation;
      - gradient: per-item count/mean statistics of the original
        predictions are collected (m-row summary, not data-sized) and
        combined with the k×m antidote block on the driver;
      - lineage: each iteration rebuilds from the base ratings + a
        fresh antidote DataFrame, so the plan depth stays constant
        (the iterative-algorithm trap of SURVEY §3.2).

    Runs on a deterministic 20% user cohort to bound retrain cost.
    """
    k, rank, lam, iters = 5, 8, 0.1, 3
    base = ratings_df(spark, sf_dir).filter(F.col("user_id") % 5 == 0)
    base = base.groupBy("user_id", "item_id").agg(F.avg("rating").alias("rating"))
    base = base.cache()

    item_ids = [r[0] for r in base.select("item_id").distinct().orderBy("item_id").collect()]
    m = len(item_ids)
    item_index = {j: idx for idx, j in enumerate(item_ids)}
    X_t = _det_init(k, m)
    antidote_uid = 1_000_000_000

    trajectory = []
    for it in range(iters):
        antidote_rows = [
            (antidote_uid + u, int(item_ids[j]), float(X_t[u, j]))
            for u in range(k)
            for j in range(m)
        ]
        antidote_df = spark.createDataFrame(
            antidote_rows, "user_id BIGINT, item_id BIGINT, rating DOUBLE"
        )
        combined = base.unionByName(antidote_df)
        als = ALS(
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            rank=rank,
            regParam=lam,
            maxIter=5,
            seed=42,
            coldStartStrategy="drop",
        )
        model = als.fit(combined)

        orig_pred = model.transform(base).filter(F.col("prediction").isNotNull())
        stats = (
            orig_pred.groupBy("item_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("prediction").alias("s"),
                F.var_pop("prediction").alias("v"),
            )
        ).collect()
        pol = float(np.mean([row["v"] for row in stats])) if stats else 0.0
        trajectory.append((it, pol, int(len(stats))))

        # fixed-V linearized gradient of COMBINED polarization wrt X̃:
        # column means include both original predictions (distributed
        # m-row summary) and the antidote block's own predictions.
        V_rows = model.itemFactors.collect()
        V_map = {row["id"]: row["features"] for row in V_rows}
        V = np.array(
            [V_map.get(int(j), [0.0] * rank) for j in item_ids], dtype=np.float64
        )
        M = ridge_hat_factor(V, lam)
        X_hat = predict_antidote(X_t, V, M)
        n_orig = np.zeros(m)
        s_orig = np.zeros(m)
        for row in stats:
            idx = item_index.get(row["item_id"])
            if idx is not None:
                n_orig[idx] = row["n"]
                s_orig[idx] = row["s"]
        col_mean = (s_orig + X_hat.sum(axis=0)) / (n_orig + k)
        n_tot = float(n_orig.sum() + k * m)
        G_hat = (2.0 / n_tot) * (X_hat - col_mean[None, :])
        grad = ((G_hat @ V) @ M) @ V.T
        # η scaled by N so the step size is O(spread·‖B‖), not O(1/N).
        X_t = np.clip(X_t - 0.5 * n_tot * grad, RATING_LO, RATING_HI)

    base.unpersist()
    return spark.createDataFrame(
        [(it, round(p, 6), n) for it, p, n in trajectory],
        "iteration INT, polarization DOUBLE, n_items INT",
    )


# ---- fairness objective (paper §5.2: antidote data for group fairness) -----


def fairness_value_np(X_tilde: np.ndarray, V: np.ndarray, M: np.ndarray) -> float:
    """Value unfairness of the antidote block under fixed V:
    groups g = user index % 2, Ey from predictions X̃·B, Er from the
    antidote ratings themselves; U_val = (1/m)·Σ_j |D_j| with
    D_j = (Ey_0 − Er_0) − (Ey_1 − Er_1)  [YH §3; paper §5.2]."""
    X_hat = predict_antidote(X_tilde, V, M)
    g0 = np.arange(X_tilde.shape[0]) % 2 == 0
    D = (X_hat[g0].mean(axis=0) - X_tilde[g0].mean(axis=0)) - (
        X_hat[~g0].mean(axis=0) - X_tilde[~g0].mean(axis=0)
    )
    return float(np.abs(D).mean())


def fairness_value_grad(
    X_tilde: np.ndarray, V: np.ndarray, M: np.ndarray
) -> np.ndarray:
    """Closed-form (sub)gradient of U_val w.r.t. X̃ through the fixed-V
    linear map: with s_u = ±1 by group, |g_u| the group size, and
    sgn = sign(D),

        ∂U/∂x̃_{u,·} = s_u/(m·|g_u|) · (B·sgn − sgn)

    — B applied as V·M·Vᵀ (three skinny products; B never formed).
    Each row differs only by the group sign/size, so the per-item
    vector (B·sgn − sgn) is computed once: O(m·r) per step."""
    k, m = X_tilde.shape
    X_hat = predict_antidote(X_tilde, V, M)
    g0 = np.arange(k) % 2 == 0
    D = (X_hat[g0].mean(axis=0) - X_tilde[g0].mean(axis=0)) - (
        X_hat[~g0].mean(axis=0) - X_tilde[~g0].mean(axis=0)
    )
    sgn = np.sign(D)
    core = (V @ (M @ (V.T @ sgn))) - sgn  # (B − I)·sgn
    grad = np.empty_like(X_tilde)
    n0, n1 = int(g0.sum()), int((~g0).sum())
    grad[g0] = core / (m * n0)
    grad[~g0] = -core / (m * n1)
    return grad


@spark_query("q_antidote_step_fairness")  # rows-only: golden-tested vs numpy
def q_antidote_step_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projected-gradient antidote step on the VALUE-UNFAIRNESS
    objective (the paper's §5.2 direction: the same Algorithm-1
    machinery with a different societal objective R).  Emits the
    objective before/after plus the updated antidote cells."""
    k, m, rank, lam, eta = 6, 20, 4, 0.1, 20.0
    X0 = _det_init(k, m)
    V = _det_factors(m, rank)
    M = ridge_hat_factor(V, lam)
    before = fairness_value_np(X0, V, M)
    X1 = np.clip(X0 - eta * fairness_value_grad(X0, V, M), RATING_LO, RATING_HI)
    after = fairness_value_np(X1, V, M)
    rows = [
        (int(u), int(j), float(X0[u, j]), round(float(X1[u, j]), 4),
         round(before, 6), round(after, 6))
        for u in range(k)
        for j in range(m)
    ]
    return spark.createDataFrame(
        rows,
        "antidote_user INT, item_idx INT, rating_before DOUBLE, rating_after DOUBLE, "
        "unfairness_before DOUBLE, unfairness_after DOUBLE",
    )
