"""Aggregation operators — SURVEY.md §2B O-13..O-19.

All expressed as declarative groupBy/agg plans: Catalyst plans a
partial (map-side) HashAggregate + final HashAggregate after the
shuffle automatically, so at 100 TB each executor pre-combines its
partitions before any exchange.  Group keys here (returnflag,
linestatus, brand, ...) are low-cardinality, so the shuffled state is
tiny regardless of input size.

Determinism: every DOUBLE aggregate is rounded in BOTH engines (see
SURVEY.md §2 determinism rules) — sums of large magnitude to 2
decimals, averages/variances to 4 — so FP summation-order differences
between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import broadcast_small as bcast

from ..registry import spark_query
from ..functions.money import sum_charged_price, sum_discounted_price
from ..sources import load_table


@spark_query(
    "q_agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
       ROUND(AVG(l_discount), 4)                                          AS avg_disc,
       COUNT(*)                                                           AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): pricing summary per returnflag/linestatus.

    Scale notes: 2-key groupBy over the fact table -> partial agg on
    every scan partition, ~6 groups shuffled.  The scan reads only the
    7 referenced columns (column pruning; verify via explain()).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            sum_discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias("sum_disc_price"),
            sum_charged_price(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@spark_query(
    "q_agg_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct per group — Catalyst plans this with an
    Expand (one replica per distinct column) + two-phase aggregate, so
    distinct state is partitioned across executors, never driver-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@spark_query(
    "q_agg_approx_distinct",
    oracle="""
SELECT CAST(COUNT(DISTINCT l_partkey)  AS BIGINT) AS n_parts_exact,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
       TRUE AS parts_within_bound,
       TRUE AS orders_within_bound
FROM lineitem
""",
)
# Oracle upgraded from rows-only in r11 (law-boolean pattern): the
# HLL++ ESTIMATES are sketch-implementation-specific (DuckDB's
# approx_count_distinct uses a different HLL) and stay out of the
# hashed surface; what IS pinned is the sketch's accuracy contract —
# |estimate - exact| <= 15% of exact (3x the rsd=0.05, far outside
# HLL++'s observed error at every fixture SF; the estimate itself is
# data-deterministic because register-max merging is commutative) —
# alongside the exact distinct counts, fully hash-matched.  A broken
# sketch flips a boolean; a broken distinct flips the counts.
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count (rsd=0.05), verified in-engine
    against exact COUNT(DISTINCT).  The sketch merges associatively
    across partitions — constant memory per executor at any scale, the
    100 TB answer to COUNT(DISTINCT); the exact leg is the
    verification harness (at 100 TB, run it on an audit slice)."""
    return _approx_distinct_frame(spark, sf_dir)


def _approx_distinct_frame(
    spark: SparkSession, sf_dir: str, est_bias: int = 0
) -> DataFrame:
    """q_agg_approx_distinct body.  ``est_bias`` is added to the HLL
    estimates BEFORE the accuracy-law comparison — 0 in production;
    the negative-control test injects a bias far outside the 15% band
    and asserts both booleans flip FALSE, proving the law actually
    reads the sketch output (r11 VERDICT #1: an accidentally
    tautological bound would be invisibly always-TRUE)."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("est_parts"),
        F.approx_count_distinct("l_orderkey", 0.05).alias("est_orders"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
    )
    within = lambda est, exact: (  # noqa: E731 — |est-exact|*20 <= 3*exact
        F.abs(F.col(est) + F.lit(est_bias) - F.col(exact)) * 20
        <= F.col(exact) * 3
    )
    return row.select(
        "n_parts_exact",
        "n_orders_exact",
        within("est_parts", "n_parts_exact").alias("parts_within_bound"),
        within("est_orders", "n_orders_exact").alias("orders_within_bound"),
    )


@spark_query(
    "q_agg_rollup",
    oracle="""
SELECT r.r_name, n.n_name,
       GROUPING(r.r_name, n.n_name) AS grp_id,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) revenue hierarchy with grouping-set id.
    Spark's grouping_id() and DuckDB's GROUPING(...) emit the same bit
    vector over the grouping columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(bcast(nation, "structural dim (25 rows)"), customer.c_nationkey == nation.n_nationkey)
        .join(bcast(region, "structural dim (5 rows)"), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("grp_id"),
        sum_discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
    )


@spark_query(
    "q_agg_cube_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS grp_id,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping sets in one
    pass via Catalyst's Expand."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("grp_id"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@spark_query(
    "q_agg_having_stats",
    oracle="""
SELECT p_brand,
       COUNT(*)                              AS n_parts,
       ROUND(AVG(p_retailprice), 4)          AS avg_price,
       ROUND(STDDEV_SAMP(p_retailprice), 4)  AS sd_price,
       ROUND(VAR_POP(p_retailprice), 4)      AS var_price,
       ROUND(quantile_cont(p_retailprice, 0.5), 4) AS median_price
FROM part
GROUP BY p_brand
HAVING COUNT(*) >= 5
""",
)
def q_agg_having_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand statistical aggregates with a HAVING filter and an
    exact interpolated median (Spark percentile == DuckDB
    quantile_cont)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("p_retailprice"), 4).alias("sd_price"),
            F.round(F.var_pop("p_retailprice"), 4).alias("var_price"),
            F.round(F.percentile("p_retailprice", F.lit(0.5)), 4).alias("median_price"),
        )
        .filter(F.col("n_parts") >= 5)
    )


@spark_query(
    "q_agg_collect_sorted",
    oracle="""
SELECT l_orderkey,
       array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS linenumbers,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
""",
)
def q_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted list of line numbers — collect_list is
    partition-order-dependent, so sort_array makes it deterministic.

    The list is emitted as an order-sensitive CSV string (not ARRAY):
    the driver's canonicalizer cannot hash array cells (r01 red row).
    Numeric sort happens BEFORE the string cast, so "10" sorts after
    "2" — same semantics the array version tested."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("linenumbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@spark_query(
    "q_agg_string_concat",
    oracle="""
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_name) AS names_csv,
       COUNT(*) AS n
FROM (SELECT * FROM customer WHERE c_custkey % 25 = 0)
GROUP BY c_mktsegment
""",
)
def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): concat_ws over
    a sorted collect_list — deterministic because the list is sorted
    before joining, regardless of partition arrival order."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    return c.groupBy("c_mktsegment").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("names_csv"),
        F.count(F.lit(1)).alias("n"),
    )


# The four probed quantiles as exact rationals (label, num, den):
# rank target = ceil(p*n) = (n*num + den - 1) DIV den, all integer.
_QPROBES = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p99", 99, 100)]
# GK sketch accuracy parameter: rank error <= n/_QACC (Spark doc
# contract for approx_percentile(..., accuracy)).
_QACC = 100


def _approx_quantile_oracle() -> str:
    cases = ",\n       ".join(
        f"CAST(MAX(CASE WHEN rn = (n*{num} + {den - 1}) // {den} THEN v END)"
        f" AS DOUBLE) AS {lbl}_exact"
        for lbl, num, den in _QPROBES
    )
    return f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       {cases},
       TRUE AS sketch_within_bound
FROM ranked
GROUP BY l_returnflag
"""


@spark_query("q_agg_approx_quantile", oracle=_approx_quantile_oracle())
# Oracle upgraded from rows-only in r11 (r10 VERDICT #4): the GK
# sketch's ESTIMATES stay implementation-specific (DuckDB uses
# t-digest — they can never hash-match), but the sketch's CONTRACT is
# checkable: approx_percentile(v, p, acc) must return an element whose
# exact rank lies within n/acc of ceil(p*n).  The operator verifies
# that bound in-engine with pure integer arithmetic (rank interval
# [count(<v)+1, count(<=v)] vs target +/- n DIV acc + 1, one unit of
# slack so a documented "<=" boundary can never flake) and emits it as
# sketch_within_bound, which the oracle pins TRUE — the same
# law-boolean pattern as q_stream_lakehouse_ingest's exactly_once.
# The exact rank-based quantiles ride along fully hash-matched
# (ceil-rank definition, no interpolation, no FP: identical integer
# DIV on both sides).
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of l_extendedprice per returnflag via
    Spark's Greenwald-Khanna sketch (approx_percentile, 1% accuracy),
    VERIFIED against the exact rank-based quantiles in one operator.

    The sketch merges associatively across partitions — the scale path
    when exact percentile's full sort-per-group is too expensive.  The
    exact leg is the classic two-pass distributed rank selection
    (r11 VERDICT #4 — the r11 distinct-value histogram degenerated to
    ~row-sized window input on this near-unique column, serializing
    into 3 giant single-task sorts at scale):

    1. a fixed-width value pre-bin (``_QBIN_CENTS``-wide cents
       buckets) bounds the cumulative-sum window input by the PRICE
       DOMAIN (~2.6k bins/group), not by row or distinct-value count —
       constant at any SF;
    2. the ceil(p*n) rank target is located to one bin + a residual
       within-bin rank, and only the target bins' rows (a broadcast
       semi-filter, ~n/2600 of the table, collapsing map-side to
       <= _QBIN_CENTS distinct cent values per probe) are refined
       through a second bounded window.

    The sketch's rank-interval law rides the same two passes: each
    v_k's exact rank interval = the bin cumsum before its bin + a
    within-bin conditional count off the refinement frame.  Total:
    three projected scans, every shuffle and window bounded by
    (groups x bins), the 100-TB shape regardless of value uniqueness.
    Measured at sf0.1 (r12 interleaved A/B, fresh subprocesses): warm
    median ~2.0 s vs r11's ~2.0 s — the pre-bin holds the constant
    while removing the degenerate sort; sub-1 s is not reachable with
    the exact-verification leg on (the r10 0.47 s was sketch-only).
    """
    return _approx_quantile_frame(spark, sf_dir)


# Exact-leg pre-bin width in cents.  l_extendedprice spans roughly
# [90_091, 10_494_950] cents, so 4096-cent bins give <= ~2.6k bins per
# group — a DOMAIN constant: rows and distinct values grow with SF,
# the bin count does not.  Bin id = round(v*100) div _QBIN_CENTS is
# monotone in v (round is monotone), which is all stage-1/stage-2
# consistency needs — no cents-exactness assumption.
_QBIN_CENTS = 4096


def _approx_quantile_frame(
    spark: SparkSession, sf_dir: str, qs_shift: float = 0.0
) -> DataFrame:
    """q_agg_approx_quantile body.  ``qs_shift`` displaces the GK
    sketch outputs BEFORE the rank-interval law — 0.0 in production;
    the negative-control test shifts them far outside every interval
    and asserts sketch_within_bound flips FALSE (proving the law reads
    the sketch and the interval arithmetic points the right way)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    )
    probs = [num / den for _, num, den in _QPROBES]
    binned = li.withColumn(
        "b", F.expr(f"cast(round(v * 100) as bigint) div {_QBIN_CENTS}")
    )

    # ---- stage 1: GK sketch scan + bounded bin-histogram scan ------
    # Two independent scans (AQE materializes independent query stages
    # concurrently); the 3-row sketch output broadcast-joins onto the
    # bin rows.  Rejected alternatives, all measured (r12 BUILDLOG):
    # a GROUPING SETS fusion of the two scans computes a useless GK
    # sketch per bin whose ~2.6k x 32-partial buffer merge cost 1.9 s;
    # sharing one (group, bin, value) histogram between this leg and
    # stage 2 re-executes the subtree (ReuseExchange does not fire
    # across the broadcast-nested copy), and pinning it with
    # localCheckpoint cost more than the scan it saved.
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("v", probs, _QACC).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    binhist = binned.groupBy("l_returnflag", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    wb = Window.partitionBy("l_returnflag").orderBy("b")
    bincum = binhist.withColumn("cum", F.sum("c").over(wb)).join(
        bcast(approx, "3-row sketch output"), "l_returnflag"
    )
    # Per group, off the SAME bin frame: (a) each rank target
    # r = ceil(p*n) is located to its first bin with cum >= r plus the
    # cumulative count just before it (= max cum among bins with
    # cum < r; cum is strictly increasing over present bins), and
    # (b) each sketch value v_k is located to its bin bv (bin id is
    # monotone in v, so every row in an earlier bin is < v_k and every
    # row in a later bin is > v_k) plus the cumulative count before
    # THAT bin.  Both legs then only need within-bin refinement.
    tgt_aggs = [F.max("n").alias("n")]
    for i, (lbl, num, den) in enumerate(_QPROBES):
        r = F.expr(f"(n*{num} + {den - 1}) div {den}")
        v_k = F.element_at("qs", i + 1) + F.lit(float(qs_shift))
        bv = F.expr(
            f"cast(round((element_at(qs, {i + 1}) + {float(qs_shift)!r}) * 100)"
            f" as bigint) div {_QBIN_CENTS}"
        )
        tgt_aggs += [
            F.min(F.when(F.col("cum") >= r, F.col("b"))).alias(f"tb_{lbl}"),
            F.coalesce(F.max(F.when(F.col("cum") < r, F.col("cum"))), F.lit(0))
            .alias(f"cb_{lbl}"),
            F.max(bv).alias(f"bv_{lbl}"),
            F.max(v_k).alias(f"vk_{lbl}"),
            F.coalesce(
                F.max(F.when(F.col("b") < bv, F.col("cum"))), F.lit(0)
            ).alias(f"cbv_{lbl}"),
        ]
    tgt = bincum.groupBy("l_returnflag").agg(tgt_aggs[0], *tgt_aggs[1:])
    # long-form bin map: one row per (group, probe) for the rank
    # targets AND one per (group, sketch value) — <= 24 rows total.
    # Each entry carries everything the final assembly needs (n, the
    # cum-before-bin counts) so `tgt` has exactly ONE consumer — a
    # two-branch reuse would re-execute the whole stage-1 subtree
    # (plan-verified: the first cut ran 5 parquet scans, this runs 3).
    probe_structs = []
    for lbl, num, den in _QPROBES:
        probe_structs.append(
            F.struct(
                F.lit(lbl).alias("probe"),
                F.col(f"tb_{lbl}").alias("b"),
                (
                    F.expr(f"(n*{num} + {den - 1}) div {den}")
                    - F.col(f"cb_{lbl}")
                ).alias("rw"),
                F.lit(None).cast("double").alias("vk"),
                # the sk-sibling's cum-before-bin rides on the rank
                # row too: rank target bins are never empty (cum
                # reaches r there), so cbv survives to the final agg
                # even when the SKETCH bin holds no rows (a displaced
                # v_k past the domain — the negative-control case)
                F.col(f"cbv_{lbl}").alias("cbv"),
                F.col("n").alias("n"),
            )
        )
        probe_structs.append(
            F.struct(
                F.lit(f"sk_{lbl}").alias("probe"),
                F.col(f"bv_{lbl}").alias("b"),
                F.lit(None).cast("long").alias("rw"),
                F.col(f"vk_{lbl}").alias("vk"),
                F.col(f"cbv_{lbl}").alias("cbv"),
                F.col("n").alias("n"),
            )
        )
    tgt_long = tgt.select(
        "l_returnflag", F.explode(F.array(*probe_structs)).alias("t")
    ).select("l_returnflag", "t.*")

    # ---- stage 2: ONE refinement pass over only the mapped bins ----
    # broadcast join = map-side filter of the scan; survivors collapse
    # map-side to <= _QBIN_CENTS distinct cent values per map entry,
    # so the within-bin window input is domain-bounded too.
    cand = binned.join(
        bcast(tgt_long, "groups x (probes + sketch bins) map, <= 24 rows"),
        ["l_returnflag", "b"],
    )
    vhist = cand.groupBy("l_returnflag", "probe", "v").agg(
        F.count(F.lit(1)).alias("c2"),
        F.max("rw").alias("rw"),
        F.max("vk").alias("vk"),
        F.max("cbv").alias("cbv"),
        F.max("n").alias("n"),
    )
    wv = Window.partitionBy("l_returnflag", "probe").orderBy("v")
    vcum = vhist.withColumn("cum2", F.sum("c2").over(wv))
    fine_aggs = [F.max("n").alias("n")]
    for lbl, _, _ in _QPROBES:
        # exact quantile: the rw-th smallest value inside the target bin
        fine_aggs.append(
            F.min(
                F.when(
                    (F.col("probe") == lbl) & (F.col("cum2") >= F.col("rw")),
                    F.col("v"),
                )
            )
            .cast("double")
            .alias(f"{lbl}_exact")
        )
        # within-bin halves of the sketch value's exact rank interval
        sk = F.col("probe") == f"sk_{lbl}"
        fine_aggs += [
            F.coalesce(
                F.sum(F.when(sk & (F.col("v") < F.col("vk")), F.col("c2"))),
                F.lit(0),
            ).alias(f"loin_{lbl}"),
            F.coalesce(
                F.sum(F.when(sk & (F.col("v") <= F.col("vk")), F.col("c2"))),
                F.lit(0),
            ).alias(f"hiin_{lbl}"),
            # cbv rides on BOTH row kinds (sk and rank-target) so it
            # survives even when the sketch bin is empty
            F.max(
                F.when(F.col("probe").isin(lbl, f"sk_{lbl}"), F.col("cbv"))
            ).alias(f"cbv_{lbl}"),
        ]
    per_group = vcum.groupBy("l_returnflag").agg(fine_aggs[0], *fine_aggs[1:])

    # ---- assemble: rank-interval law with integer arithmetic only --
    # [lo+1, hi] (exact rank interval of v_k: lo = count(< v_k) =
    # cum-before-bin + within-bin count, hi likewise with <=) must be
    # NON-EMPTY (hi > lo: the sketch returned an actual element of the
    # column, not a phantom value) and intersect [target - slack,
    # target + slack], slack = n DIV acc + 1 — integer cross-
    # multiplied comparisons, no FP anywhere.
    slack = F.expr(f"n div {_QACC}") + 1
    ok = F.lit(True)
    for lbl, num, den in _QPROBES:
        lo = F.col(f"cbv_{lbl}") + F.col(f"loin_{lbl}")
        hi = F.col(f"cbv_{lbl}") + F.col(f"hiin_{lbl}")
        ok = ok & (
            (hi > lo)
            & (hi * den >= F.col("n") * num - slack * den)
            & ((lo + 1) * den <= F.col("n") * num + slack * den)
        )
    return per_group.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        *[f"{lbl}_exact" for lbl, _, _ in _QPROBES],
        ok.alias("sketch_within_bound"),
    )


@spark_query(
    "q_reagg_partial",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       o_orderpriority,
       COUNT(*)                                            AS n_orders,
       CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS BIGINT)
                                                           AS n_days_merged,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
                                                           AS sum_price,
       CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE)         AS min_price,
       CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE)         AS max_price,
       CAST((CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) * 200
             + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000.0
                                                           AS avg_price
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_reagg_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation from partial aggregates — the materialized-view
    maintenance algebra: DAILY partials (count / decimal sum / min /
    max per (day, priority)) roll up to MONTHLY figures WITHOUT
    touching base rows again; avg derives from merged sum/count.

    The oracle aggregates the base table directly — the hash match
    verifies the re-aggregation law (sums of sums, mins of mins,
    counts of counts, avg from merged partials) that every
    incremental-rollup pipeline depends on.

    Scale: this is the two-level pattern that keeps a 100 TB metrics
    pipeline incremental — each day's partial is computed once from
    that day's partition and is tiny (groups, not rows); the monthly
    (or yearly) rollup reads ONLY partials.  Decimal partial sums make
    the merge order-independent, so re-aggregation is exact."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    monthly = daily.groupBy(
        F.substring("day", 1, 7).alias("month"), "o_orderpriority"
    ).agg(
        F.sum("n").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_days_merged"),
        F.round(F.sum("s"), 2).cast("double").alias("sum_price"),
        F.round(F.min("mn"), 2).cast("double").alias("min_price"),
        F.round(F.max("mx"), 2).cast("double").alias("max_price"),
        # avg at 4 dp via EXACT integer arithmetic: the decimal sum is
        # exact cents, and half-up rounding of cents*100/n is the pure
        # integer identity (a*2 + b) div (2*b) — the double division
        # ROUND(sum/count, 4) sat an ulp either side of a .xxxx5
        # boundary per engine (caught by the sf0.1 sweep: 253248.93275
        # rounded .9327 in Spark, .9328 in DuckDB).  Same integer in
        # both engines -> same double -> same hash.
        (
            F.expr(
                "(cast(sum(s) * 100 as bigint) * 200 + sum(n)) div (2 * sum(n))"
            ).cast("double")
            / F.lit(10000.0)
        ).alias("avg_price"),
    )
    return monthly.orderBy("month", "o_orderpriority")


@spark_query("q_reagg_hll_sketch")  # rows-only: sketch estimates are
# engine-specific (Apache DataSketches HLL has no DuckDB twin); the
# accuracy contract is test-enforced instead (tests/test_round5_ops.py
# asserts <2% relative error vs the exact distinct at sf0.001)
def q_reagg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-distinct re-aggregation via HyperLogLog sketch
    MERGE — the sketch-algebra twin of q_reagg_partial: daily HLL
    sketches of the customer set (per priority) merge into monthly
    distinct-customer estimates WITHOUT re-reading base rows.

    This mergeability is what makes approximate distinct usable in an
    incremental 100 TB pipeline: exact COUNT(DISTINCT) partials do NOT
    re-aggregate (distinct sets must be re-unioned from raw rows), but
    HLL registers max-merge associatively — each day's partition is
    sketched once (bytes per group), months/years/segments roll up
    from sketches alone.  lgConfigK=14 -> ~0.5% typical error, 16 KiB
    per sketch.  Emits both levels so the merge is visible: per-month
    estimate + the count of daily sketches merged."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "o_orderpriority",
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    monthly = daily.groupBy(
        F.substring("day", 1, 7).alias("month"), "o_orderpriority"
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct_custs"),
        F.count(F.lit(1)).cast("bigint").alias("n_daily_sketches"),
    )
    return monthly.orderBy("month", "o_orderpriority")


@spark_query(
    "q_agg_exact_median_mode",
    oracle="""
WITH med AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         ROUND(median(l_quantity), 4) AS median_qty,
         ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
  FROM lineitem GROUP BY 1, 2
),
cnts AS (
  SELECT l_returnflag, l_linestatus, l_quantity AS qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2, 3
),
mode_t AS (
  SELECT l_returnflag, l_linestatus,
         MIN(qty) FILTER (WHERE cnt = mx) AS mode_qty,
         MAX(cnt) AS mode_cnt
  FROM (SELECT *, MAX(cnt) OVER (PARTITION BY l_returnflag, l_linestatus) AS mx
        FROM cnts)
  GROUP BY 1, 2
)
SELECT m.l_returnflag, m.l_linestatus, m.n_rows, m.median_qty, m.p90_qty,
       t.mode_qty, t.mode_cnt
FROM med m JOIN mode_t t USING (l_returnflag, l_linestatus)
""",
)
def q_agg_exact_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics per group: interpolated median and p90
    (percentile_cont semantics) plus the mode with a DETERMINISTIC
    min-value tie-break — the native ``mode()`` of both engines is
    free to pick any modal value on ties, so the mode here is computed
    explicitly from the (group, value) count relation: max count, then
    min value among the maxima.

    Shape: the median/p90 leg is one groupBy over 6 groups (exact
    percentile holds per-group value buffers — fine because the GROUP
    count is tiny; for high-cardinality groups the approx_percentile
    sketch in q_agg_approx_quantile is the scale path).  The mode leg
    pre-aggregates to (group, value) partial counts first — shuffle
    carries at most |groups| x |distinct values| rows, never raw rows
    — then a 6-row window + fold.  The two 6-row legs broadcast-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )
    cnts = li.groupBy(
        "l_returnflag", "l_linestatus", F.col("l_quantity").alias("qty")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("l_returnflag", "l_linestatus")
    mode_t = (
        cnts.withColumn("mx", F.max("cnt").over(w))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min(F.when(F.col("cnt") == F.col("mx"), F.col("qty"))).alias("mode_qty"),
            F.max("cnt").alias("mode_cnt"),
        )
    )
    return med.join(
        bcast(mode_t, "per-group mode table (<=6 rows)"), ["l_returnflag", "l_linestatus"]
    ).select(
        "l_returnflag", "l_linestatus", "n_rows", "median_qty", "p90_qty",
        "mode_qty", "mode_cnt",
    )
