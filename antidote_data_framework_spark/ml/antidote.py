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

from ..functions.hints import broadcast_bounded
from ..registry import spark_query
from .recsys_data import ratings_df

RATING_LO, RATING_HI = 1.0, 5.0

# Retrain-free half-step schedule for q_antidote_loop's efficient mode
# (sub-step count × normalized sub-step size along the last bilevel
# gradient).  Tuned so the final retrain never lands above the first
# iteration's polarization at any fixture SF (see loop docstring).
HALF_SUB_STEPS = 2
HALF_SUB_ETA = 0.05


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


def fused_item_summary(
    pred: DataFrame, uf: DataFrame, rank: int, n_users: int | None = None
) -> DataFrame:
    """The ONE fused per-item summary pass of the bilevel gradient
    (r7 budget work) — everything the driver-side assembly needs in a
    single m-row aggregation over pred⋈userFactors:

      n_obs, μ_j, var_j           (polarization + gradient scale)
      pf_p = Σ_i x̂_ij·u_ip        (the Σ x̂·u half of g_j)
      sf_p = Σ_i u_ip             (the μ·Σu half of g_j)
      a_pq = Σ_i u_ip·u_iq        (A_j's original-observer triangle)

    The old shape ran three data-sized jobs (μ/var stats, g_j over
    pred⋈μ⋈uf, A_j over combined⋈uf) plus a checkpoint; the algebra
    g_j = Σ(x̂−μ)·u = Σx̂·u − μ·Σu removes all but this one pass.
    Equivalence to the naive three-job form and to a pure-numpy replay
    is test-pinned in tests/test_antidote_fused.py (r7 VERDICT #1).

    MLlib emits float32 predictions/factors; without the explicit
    double casts below Spark would round every PRODUCT to float32
    before summing (float*float→float), costing ~7 significant digits
    exactly where the Σx̂·u − μ·Σu cancellation needs them (measured:
    1e-7 → 1e-12 relative error vs the float64 replay).

    ``n_users`` (optional): measured user-factor row count — when
    given, the factor side is broadcast via the bounded hint (r12:
    the un-hinted join planned sort-merge because factor-table size
    estimates are unknown post-RDD, shuffling the prediction rows by
    user per iteration; one row per user × rank doubles is
    comfortably bounded at any bench SF and degrades to the shuffle
    join past the limit)."""
    p_d = F.col("prediction").cast("double")

    def f_d(p: int):
        return F.col("features")[p].cast("double")

    if n_users is not None:
        uf = broadcast_bounded(uf, n_users)
    return (
        pred.join(uf, "user_id")
        .groupBy("item_id")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.avg(p_d).alias("mu"),
            F.var_pop(p_d).alias("v"),
            *[F.sum(p_d * f_d(p)).alias(f"pf{p}") for p in range(rank)],
            *[F.sum(f_d(p)).alias(f"sf{p}") for p in range(rank)],
            *[
                F.sum(f_d(p) * f_d(q)).alias(f"a{p}_{q}")
                for p in range(rank)
                for q in range(p, rank)
            ],
        )
    )


def bilevel_grad_from_summary(
    s_rows,
    item_index: dict,
    U_ant: dict[int, np.ndarray],
    k: int,
    rank: int,
    lam: float,
    antidote_uid: int,
) -> np.ndarray:
    """Driver-side k×m bilevel-gradient assembly from the m collected
    summary rows (see ``fused_item_summary``) plus the k antidote
    factor vectors:

        grad[a, j] = (2/(m·n_j)) · g_jᵀ · A_j⁻¹ · u_a
        A_j = λI + Σ_{i∈origΩ_j} u_i·u_iᵀ + Σ_a u_a·u_aᵀ

    The antidote users are FULLY observed, so their A-contribution is
    the same r×r matrix for every item — added once here instead of
    shuffling the antidote block through the join."""
    m = len(item_index)
    A_ant = np.zeros((rank, rank))
    for ua in U_ant.values():
        A_ant += np.outer(ua, ua)

    G = np.zeros((m, rank))
    A = np.tile(lam * np.eye(rank) + A_ant, (m, 1, 1))
    N = np.ones(m)
    for r in s_rows:
        i = item_index.get(r["item_id"])
        if i is None:
            continue
        mu_i = r["mu"] or 0.0
        # g_j as Σx̂·u − μ·Σu cancels two same-magnitude sums, losing
        # precision when the per-item prediction spread is much smaller
        # than the mean — safe HERE because the gradient is only ever
        # used max-normalized (direction), but any future consumer of G
        # unnormalized must revisit this accumulation (SCALE.md note).
        G[i] = [
            (r[f"pf{p}"] or 0.0) - mu_i * (r[f"sf{p}"] or 0.0) for p in range(rank)
        ]
        N[i] = r["n_obs"]
        for p in range(rank):
            for q in range(p, rank):
                v = r[f"a{p}_{q}"] or 0.0
                A[i, p, q] += v
                if p != q:
                    A[i, q, p] += v
    ainv_g = np.stack([np.linalg.solve(A[i], G[i]) for i in range(m)])
    grad = np.zeros((k, m))
    for a in range(k):
        ua = U_ant.get(antidote_uid + a)
        if ua is not None:
            grad[a] = (2.0 / (m * N)) * (ainv_g @ ua)
    return grad


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
    ALS on X∪X̃ → measure original-user polarization → bilevel gradient
    step on X̃ → project) → emit the trajectory, including the
    no-antidote baseline (iteration = -1).

    The gradient is the paper's fixed-U half-step derivative THROUGH
    the item-factor update: V_j solves the ridge system A_j·V_j = b_j
    with A_j = Σ_{i∈Ω_j} u_i·u_iᵀ + λI, and the antidote user a (fully
    observed) shifts every V_j, so

        ∂R_pol/∂x̃_{a,j} = (2/(m·n_j)) · g_jᵀ · A_j⁻¹ · u_a,
        g_j = Σ_{i∈orig Ω_j} (x̂_ij − μ_j)·u_i.

    Distribution contract per iteration (the 100 TB shape):
      - retrain: MLlib ALS on the combined ratings;
      - summaries: ONE fused wide aggregation over pred⋈userFactors
        (μ_j, var_j, n_j, Σ x̂·u, Σ u, and the r(r+1)/2 outer-product
        sums for A_j's original-observer part) — an m-row result,
        never data-sized.  g_j = Σ x̂·u − μ_j·Σ u by linearity, and
        the fully-observed antidote users contribute the SAME
        Σ_a u_a·u_aᵀ to every A_j, added driver-side from the k
        collected factor rows;
      - driver: k×m gradient assembly from the summaries + the k
        antidote factor rows; normalized 0.5-rating-unit step,
        projected to the rating box;
      - lineage: every iteration rebuilds from base + a fresh antidote
        DataFrame (constant plan depth — SURVEY §3.2).

    Efficient mode (r4 VERDICT #4): the middle iteration is RETRAIN-
    FREE — the bilevel gradient depends on X̃ only through the trained
    model's summaries, so between retrains the last computed gradient
    remains the valid descent direction and is re-applied as small
    projected sub-steps (clipping makes repeated sub-steps ≠ one big
    step; the box re-activates per sub-step).  Deployed predictions
    don't move until the next retrain, so that iteration's trajectory
    row honestly repeats the measured polarization; the refined X̃
    pays off at the final retrain.  Cost: 3 ALS fits instead of 4 —
    the fits ARE the loop's wall time (r4 bench: 24.9 s, ~6 s/fit at
    sf0.1).  (The fixed-V closed form X̂ = X̃·B(V) was tried as the
    half-step surrogate first: it optimizes the ANTIDOTE block's own
    prediction spread, which measurably regressed the original-user
    objective after retrain — 0.77 → 0.86 at both sf0.001/sf0.01 —
    so the gradient-continuation form is used instead.)

    Measured at sf0.001: baseline 1.0346 → best 0.7781 (-24.8%),
    reproducing the paper's antidote effect direction.  Runs on a
    deterministic 20% user cohort to bound retrain cost.  (r7: the
    fused summary pass cut warm sf0.1 wall from ~19 s to ~14 s; the
    trajectory values moved in the 3rd decimal because g_j is now
    accumulated in the algebraically equivalent Σx̂·u − μ·Σu order.)
    """
    k, rank, lam, iters = 5, 8, 0.1, 3
    half_step_iters = {1}  # retrain-free iterations
    antidote_uid = 1_000_000_000
    base = ratings_df(spark, sf_dir).filter(F.col("user_id") % 5 == 0)
    base = base.groupBy("user_id", "item_id").agg(F.avg("rating").alias("rating"))
    base = base.cache()

    item_ids = [
        r[0] for r in base.select("item_id").distinct().orderBy("item_id").collect()
    ]
    m = len(item_ids)
    item_index = {j: idx for idx, j in enumerate(item_ids)}

    # ALS block count sized to the data, not the default 10: MLlib's
    # per-iteration cost has a fixed per-block scheduling/shuffle floor
    # (10 blocks -> 100 user x item block pairs), which dominates when
    # blocks hold only ~10k ratings.  Target ~60k ratings/block —
    # measured at sf0.1 (119k cohort ratings): 10 blocks = 4.7 s/fit,
    # 4 blocks = 2.0 s/fit, identical learning quality.  At 100 TB the
    # same formula scales blocks UP with the cohort so a block never
    # outgrows executor memory — this is the knob's actual purpose.
    # One aggregation returns both loop-invariant counts (r12: was a
    # count() job plus a distinct().count() job — two full passes over
    # the data-sized cohort table; count/countDistinct are exact, so
    # als_blocks and the broadcast bound are unchanged).  NOTE
    # (r12 ADVICE): countDistinct ignores NULLs where the replaced
    # distinct().count() counted a NULL group — equivalent here ONLY
    # because the cohort filter (user_id % 5 == 0) guarantees non-null
    # user_id; revisit this line if that filter ever changes.
    _counts = base.agg(
        F.count(F.lit(1)).alias("n_ratings"),
        F.countDistinct("user_id").alias("n_users"),
    ).first()
    n_ratings = int(_counts["n_ratings"])
    als_blocks = max(2, min(64, int(n_ratings // 60_000) or 2))
    # user-factor row bound for the fused summary's broadcast hint
    # (combined users = cohort users + the k antidote users; constant
    # across iterations, so measured once)
    n_users = int(_counts["n_users"]) + k

    def _fit(df):
        als = ALS(
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            rank=rank,
            regParam=lam,
            maxIter=5,
            seed=42,
            coldStartStrategy="drop",
            numUserBlocks=als_blocks,
            numItemBlocks=als_blocks,
        )
        return als.fit(df)

    def _orig_pred(model):
        """Original-user predictions under the current model.  Lazy —
        each iteration has exactly ONE action reading it (the fused
        summary aggregation below), so the factor-join transform runs
        once per iteration with no checkpoint materialization job."""
        return model.transform(base).filter(F.col("prediction").isNotNull())

    def _orig_item_stats(pred):
        return (
            pred.groupBy("item_id")
            .agg(
                F.avg("prediction").alias("mu"),
                F.count(F.lit(1)).alias("n_obs"),
                F.var_pop("prediction").alias("v"),
            )
        )

    trajectory = []
    baseline_model = _fit(base)
    base_stats = _orig_item_stats(_orig_pred(baseline_model)).collect()
    baseline_pol = float(np.mean([r["v"] for r in base_stats])) if base_stats else 0.0
    trajectory.append((-1, baseline_pol, len(base_stats)))

    X_t = _det_init(k, m)
    last_grad = None
    for it in range(iters):
        if it in half_step_iters and last_grad is not None:
            # Retrain-free half-step: the bilevel gradient is a
            # function of the TRAINED model's summaries (A_j, g_j,
            # U_ant), none of which move until the next retrain — so
            # between retrains the valid descent direction is the last
            # computed gradient, applied as a further projected step
            # (clipping makes repeated sub-steps ≠ one big step).  The
            # deployed model is untouched, so the measured original-
            # user polarization is unchanged — repeat the last
            # measurement honestly; the refined X̃ pays off at the
            # next retrain.
            gmax = float(np.abs(last_grad).max()) or 1.0
            for _ in range(HALF_SUB_STEPS):
                X_t = np.clip(
                    X_t - (HALF_SUB_ETA / gmax) * last_grad, RATING_LO, RATING_HI
                )
            prev_it, prev_pol, prev_n = trajectory[-1]
            trajectory.append((it, prev_pol, prev_n))
            continue
        antidote_rows = [
            (antidote_uid + u, int(item_ids[j]), float(X_t[u, j]))
            for u in range(k)
            for j in range(m)
        ]
        antidote_df = spark.createDataFrame(
            antidote_rows, "user_id BIGINT, item_id BIGINT, rating DOUBLE"
        )
        combined = base.unionByName(antidote_df)
        model = _fit(combined)

        uf = model.userFactors.withColumnRenamed("id", "user_id")

        # ONE fused summary pass per iteration — see fused_item_summary
        # for the algebra (g_j = Σx̂·u − μ·Σu; antidote A-contribution
        # added driver-side since it is item-invariant).  A_j's
        # original-observer part comes from the same pred⋈uf join
        # (every combined user and item is in training, so factor rows
        # exist for all and the inner joins are lossless).
        s_rows = fused_item_summary(_orig_pred(model), uf, rank, n_users=n_users).collect()
        pol = float(np.mean([r["v"] for r in s_rows])) if s_rows else 0.0
        trajectory.append((it, pol, len(s_rows)))

        U_ant = {
            r["user_id"]: np.array(r["features"], dtype=np.float64)
            for r in uf.filter(F.col("user_id") >= antidote_uid).collect()
        }
        grad = bilevel_grad_from_summary(
            s_rows, item_index, U_ant, k, rank, lam, antidote_uid
        )
        gmax = float(np.abs(grad).max()) or 1.0
        X_t = np.clip(X_t - (0.5 / gmax) * grad, RATING_LO, RATING_HI)
        last_grad = grad

    base.unpersist()
    return spark.createDataFrame(
        [
            (it, round(p, 6), n, round(baseline_pol - p, 6))
            for it, p, n in trajectory
        ],
        "iteration INT, polarization DOUBLE, n_items INT, improvement_vs_baseline DOUBLE",
    )


@spark_query("q_antidote_grad_sharded")  # rows-only: golden-tested vs numpy
def q_antidote_grad_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed fixed-V antidote gradient — the 100 TB sharding of
    q_antidote_step that the module header promises ("at 100 TB the
    same math shards by item block").  m = every distinct item in the
    fixture's ratings; NOTHING m-sized ever reaches the driver:

      pass 1 (one distributed agg): S = VᵀV (r×r) and XV = X̃V (k×r)
      driver:  M = (S + λI)⁻¹,  C = XV·M    — so X̂ = C·Vᵀ
      pass 2 (one distributed agg): GV = ĜV (k×r), where per item j
        Ĝ[:,j] = (2/(k·m))·(X̂[:,j] − mean_u X̂[:,j]) is rebuilt from
        C and v_j inside the aggregation expressions
      driver:  D = GV·M
      pass 3 (projection, no shuffle): grad[:,j] = D·v_j; every
        antidote cell (user, item, grad, projected update) is emitted
        as a distributed result — k×m rows that live on executors.

    Driver state is k×r + r×r.  X̃ and V are deterministic modulo laws
    of (user, item_id), so every executor reconstructs its item shard
    locally — the same role a co-partitioned itemFactors table plays
    when V comes from a trained model.  All three passes compile to
    whole-stage codegen (k·r literal-injected expressions, k=5 r=8);
    ``applyInPandas`` over item blocks is the documented fallback once
    k·r outgrows expression injection.  Gradient math is identical to
    ml/antidote.polarization_grad — golden-tested against it on the
    real fixture items in tests/test_antidote_sharded.py."""
    k, rank, lam, eta = 5, 8, 0.1, 5.0

    def v_col(p: int):  # deterministic item-factor law (matches _det_factors)
        return (((F.col("item_id") + 1) * 7 + (p + 1) * 13) % 11) / 11.0 - 0.5

    def x_col(u: int):  # deterministic antidote-rating law (matches _det_init)
        return (1 + (F.lit(u) * 7 + F.col("item_id") * 13) % 5).cast("double")

    items = ratings_df(spark, sf_dir).select("item_id").distinct()
    wf = items.select(
        "item_id",
        *[v_col(p).alias(f"v{p}") for p in range(rank)],
        *[x_col(u).alias(f"x{u}") for u in range(k)],
    )
    # materialize the m-row factor shard table once — all three passes
    # read it (exactly the role of a persisted itemFactors table; a
    # lazy plan would re-run the ratings join + distinct per pass)
    wf = wf.localCheckpoint()

    # pass 1: S = VᵀV and XV = X̃V in a single wide aggregation
    row = wf.agg(
        F.count(F.lit(1)).alias("m"),
        *[
            F.sum(F.col(f"v{p}") * F.col(f"v{q}")).alias(f"s{p}_{q}")
            for p in range(rank)
            for q in range(p, rank)
        ],
        *[
            F.sum(F.col(f"x{u}") * F.col(f"v{p}")).alias(f"xv{u}_{p}")
            for u in range(k)
            for p in range(rank)
        ],
    ).first()
    m = int(row["m"])
    S = np.empty((rank, rank))
    for p in range(rank):
        for q in range(p, rank):
            S[p, q] = S[q, p] = row[f"s{p}_{q}"]
    XV = np.array([[row[f"xv{u}_{p}"] for p in range(rank)] for u in range(k)])
    M = np.linalg.inv(S + lam * np.eye(rank))
    C = XV @ M  # k×r: X̂ = C·Vᵀ

    # pass 2: GV = ĜV — Ĝ[:,j] rebuilt per item from C (literals) and v_j
    xhat = [
        sum(F.lit(float(C[u, p])) * F.col(f"v{p}") for p in range(rank))
        for u in range(k)
    ]
    mean_hat = sum(xhat) / F.lit(float(k))
    scale = 2.0 / (k * m)
    ghat = [(xh - mean_hat) * F.lit(scale) for xh in xhat]
    row2 = wf.agg(
        *[
            F.sum(ghat[u] * F.col(f"v{p}")).alias(f"gv{u}_{p}")
            for u in range(k)
            for p in range(rank)
        ]
    ).first()
    GV = np.array([[row2[f"gv{u}_{p}"] for p in range(rank)] for u in range(k)])
    D = GV @ M  # k×r: grad = D·Vᵀ

    # pass 3: per-item gradient + projected step, emitted distributed
    grads = [
        sum(F.lit(float(D[u, p])) * F.col(f"v{p}") for p in range(rank))
        for u in range(k)
    ]
    cells = wf.select(
        "item_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(u).alias("antidote_user"),
                        x_col(u).alias("rating_before"),
                        F.round(grads[u], 10).alias("grad"),
                        F.round(
                            F.least(
                                F.lit(RATING_HI),
                                F.greatest(F.lit(RATING_LO), x_col(u) - eta * grads[u]),
                            ),
                            4,
                        ).alias("rating_after"),
                    )
                    for u in range(k)
                ]
            )
        ).alias("c"),
    )
    return cells.select(
        F.col("c.antidote_user").alias("antidote_user"),
        "item_id",
        F.col("c.rating_before").alias("rating_before"),
        F.col("c.grad").alias("grad"),
        F.col("c.rating_after").alias("rating_after"),
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
