"""Lakehouse operations over the in-repo versioned table format
(sources/vtable.py): ACID commit, MERGE, snapshot isolation, time
travel — exercised end-to-end and verified against a SQL oracle that
recomputes both snapshots from the base tables.

This is the working complement to sources/lakehouse.py's jar probe:
the jars add an implementation, not the semantics — the semantics are
demonstrated here with stdlib manifests + plain parquet.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spark_query
from ..sources import load_table
from ..sources.vtable import VersionedTable

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "vtable",
)


def _fresh_table_dir() -> str:
    """A unique table directory per call, with best-effort pruning of
    stale siblings (each run is immutable by design; dirs older than
    an hour are leftovers from previous bench/verify runs)."""
    import shutil
    import time

    try:
        cutoff = time.time() - 3600
        for d in os.listdir(_SCRATCH):
            p = os.path.join(_SCRATCH, d)
            if os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    return os.path.join(_SCRATCH, uuid.uuid4().hex)


def _money_sum(col):
    """Exact-decimal money sum (functions/money.py discipline)."""
    return F.round(F.sum(F.col(col).cast("decimal(14,2)")), 2).cast("double")


def _urgent_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE updates feed: per-customer urgent-order counts."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )


# One built demo table per (session, sf_dir): the three lakehouse
# queries all read the same immutable v0/v1 snapshots, so one
# copy-on-write build serves all (the ml/recsys_data._COMPONENT_CACHE
# pattern; cleared between bench sweeps by clear_derived_caches).
_DEMO_TABLE_CACHE: dict[str, str] = {}


def _demo_table(spark: SparkSession, sf_dir: str) -> VersionedTable:
    """CREATE the customer dimension as v0, MERGE the urgent-order
    updates as v1 (segment → 'URGENT-VIP', acctbal += n_urgent),
    return the table handle.  Snapshots are immutable, so sharing the
    build across queries changes nothing they can observe."""
    key = f"{id(spark)}:{sf_dir}"
    if key in _DEMO_TABLE_CACHE:
        return VersionedTable(spark, _DEMO_TABLE_CACHE[key])
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(customer)
    vt.merge(
        _urgent_updates(spark, sf_dir),
        "c_custkey",
        {
            "c_mktsegment": F.lit("URGENT-VIP"),
            "c_acctbal": F.col("c_acctbal") + F.col("n_urgent"),
        },
    )
    _DEMO_TABLE_CACHE[key] = vt.path
    return vt


@spark_query(
    "q_lakehouse_timetravel",
    oracle="""
WITH upd AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
),
v0 AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
),
v1 AS (
  SELECT c.c_custkey,
         CASE WHEN u.c_custkey IS NOT NULL THEN 'URGENT-VIP'
              ELSE c.c_mktsegment END                        AS c_mktsegment,
         CASE WHEN u.c_custkey IS NOT NULL THEN c.c_acctbal + u.n_urgent
              ELSE c.c_acctbal END                           AS c_acctbal
  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
)
SELECT 0 AS version, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_mktsegment = 'URGENT-VIP' THEN 1 ELSE 0 END) AS BIGINT) AS n_vip,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_acctbal
FROM v0
UNION ALL
SELECT 1 AS version, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_mktsegment = 'URGENT-VIP' THEN 1 ELSE 0 END) AS BIGINT) AS n_vip,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_acctbal
FROM v1
""",
)
def q_lakehouse_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full lakehouse lifecycle, hash-verified: CREATE a versioned
    table from the customer dimension (commit v0), MERGE an updates
    feed into it — customers with urgent orders get segment
    'URGENT-VIP' and an acctbal adjustment (copy-on-write commit v1) —
    then TIME-TRAVEL both snapshots and emit their summaries.  The
    oracle recomputes v0/v1 from the base tables, so the manifest log,
    atomic commit, MERGE semantics, and snapshot isolation are all on
    the hash-verified path."""
    vt = _demo_table(spark, sf_dir)
    assert [m["op"] for m in vt.history()] == ["create", "merge"]

    def summary(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("c_mktsegment") == "URGENT-VIP", 1).otherwise(0)
            ).alias("n_vip"),
            _money_sum("c_acctbal").alias("sum_acctbal"),
        ).select(F.lit(version).alias("version"), "n_rows", "n_vip", "sum_acctbal")

    return summary(vt.read(0), 0).unionByName(summary(vt.read(1), 1))


@spark_query(
    "q_lakehouse_changefeed",
    oracle="""
WITH upd AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
)
SELECT c.c_custkey,
       c.c_mktsegment                         AS seg_before,
       'URGENT-VIP'                           AS seg_after,
       CAST(ROUND(CAST(u.n_urgent AS DECIMAL(14,2)), 2) AS DOUBLE) AS acctbal_delta
FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
""",
)
def q_lakehouse_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change feed between two table versions: diff the v0 and v1
    snapshots BY KEY and emit one row per changed key with before/
    after values and the numeric delta — the read side of a
    change-data-capture pipeline (what Delta's CDF / Iceberg's
    incremental reads provide), derived purely from the manifest log's
    immutable snapshots.  The oracle recomputes the expected changes
    from the base tables, so the diff itself is hash-verified.

    Scale shape: one equi-join of two snapshots on the table key —
    co-partitioned by construction when both versions share data
    files; only rewritten files actually differ, so at 100 TB the
    diff reads the touched files plus a pruned scan of the rest."""
    vt = _demo_table(spark, sf_dir)
    v0, v1 = vt.read(0).alias("v0"), vt.read(1).alias("v1")
    return (
        v0.join(v1, "c_custkey")
        .filter(
            (F.col("v0.c_mktsegment") != F.col("v1.c_mktsegment"))
            | (F.col("v0.c_acctbal") != F.col("v1.c_acctbal"))
        )
        .select(
            "c_custkey",
            F.col("v0.c_mktsegment").alias("seg_before"),
            F.col("v1.c_mktsegment").alias("seg_after"),
            F.round(
                (F.col("v1.c_acctbal") - F.col("v0.c_acctbal")).cast("decimal(14,2)"), 2
            )
            .cast("double")
            .alias("acctbal_delta"),
        )
    )


@spark_query(
    "q_lakehouse_incremental_agg",
    oracle="""
WITH upd AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
),
v1 AS (
  SELECT c.c_custkey,
         CASE WHEN u.c_custkey IS NOT NULL THEN 'URGENT-VIP'
              ELSE c.c_mktsegment END AS c_mktsegment,
         CASE WHEN u.c_custkey IS NOT NULL THEN c.c_acctbal + u.n_urgent
              ELSE c.c_acctbal END    AS c_acctbal
  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_acctbal
FROM v1 GROUP BY c_mktsegment
""",
)
def q_lakehouse_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-segment aggregate of the
    MERGED table version is maintained from the v0 aggregate plus the
    CHANGE FEED — the changed rows are retracted from their old groups
    and inserted into their new ones; v1 itself is never re-aggregated.
    The oracle recomputes the v1 aggregate directly from the base
    tables, so the hash-match PROVES the incremental result exact.

    This is the 100 TB play for maintained rollups: a merge touching
    0.1% of rows updates the aggregate with |changes| work instead of
    a full recompute — retraction (-before) + insertion (+after) per
    changed row, summed into the standing aggregate.  Decimal sums
    make retraction exact (float sums would drift under cancellation)."""
    vt = _demo_table(spark, sf_dir)

    dec = lambda c: F.col(c).cast("decimal(14,2)")  # noqa: E731
    # standing v0 aggregate (exact decimal state, as a maintained view stores)
    base_agg = vt.read(0).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(dec("c_acctbal")).alias("sum_acctbal"),
    )
    # change feed between v0 and v1 (same diff as q_lakehouse_changefeed)
    v0, v1 = vt.read(0).alias("v0"), vt.read(1).alias("v1")
    changes = (
        v0.join(v1, "c_custkey")
        .filter(
            (F.col("v0.c_mktsegment") != F.col("v1.c_mktsegment"))
            | (F.col("v0.c_acctbal") != F.col("v1.c_acctbal"))
        )
        .select(
            F.col("v0.c_mktsegment").alias("seg_before"),
            F.col("v0.c_acctbal").alias("bal_before"),
            F.col("v1.c_mktsegment").alias("seg_after"),
            F.col("v1.c_acctbal").alias("bal_after"),
        )
    )
    # retract from old group, insert into new group — |changes|-sized work
    deltas = (
        changes.select(
            F.col("seg_before").alias("c_mktsegment"),
            F.lit(-1).cast("long").alias("dn"),
            (-dec("bal_before")).alias("dsum"),
        )
        .unionByName(
            changes.select(
                F.col("seg_after").alias("c_mktsegment"),
                F.lit(1).cast("long").alias("dn"),
                dec("bal_after").alias("dsum"),
            )
        )
        .groupBy("c_mktsegment")
        .agg(F.sum("dn").alias("dn"), F.sum("dsum").alias("dsum"))
    )
    return (
        base_agg.join(deltas, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            (F.coalesce("n_rows", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_rows"),
            F.round(
                F.coalesce(F.col("sum_acctbal"), F.lit(0).cast("decimal(14,2)"))
                + F.coalesce(F.col("dsum"), F.lit(0).cast("decimal(14,2)")),
                2,
            )
            .cast("double")
            .alias("sum_acctbal"),
        )
        .filter(F.col("n_rows") > 0)  # groups fully retracted disappear
    )


@spark_query(
    "q_lakehouse_zonemap_skip",
    oracle="""
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
rng AS (
  SELECT m * 2 // 5 AS lo, m // 2 AS hi FROM mx
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
         AS sum_totalprice
FROM orders o CROSS JOIN rng
WHERE o.o_orderkey BETWEEN rng.lo AND rng.hi
GROUP BY o.o_orderpriority
""",
)
def q_lakehouse_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest zone-map file skipping, hash-verified: the orders
    table is committed to the versioned format range-partitioned on
    o_orderkey (8 data files with near-disjoint key ranges), the
    commit records each file's [min, max] per column FROM ITS PARQUET
    FOOTER, and a key-range query resolves which files can possibly
    match from the MANIFEST ALONE — then scans only those, applying
    the real predicate on top (the zone map is a superset filter).

    The oracle recomputes the same aggregate over the full table, so
    the hash-match proves skipping lost no rows; the plan-level claim
    — that most files were never opened — is asserted in
    tests/test_vtable.py (n_files_read < n_files_total).

    100 TB shape: planning cost = one manifest read (file count, not
    data size); scan cost = only overlapping files.  This is the
    mechanism behind Delta/Iceberg partition+stats pruning, and the
    reason sorted/range-partitioned layout (q_zorder_layout) pays off
    at write time."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(orders.repartitionByRange(8, "o_orderkey"), collect_stats=True)

    mx = orders.agg(F.max("o_orderkey")).first()[0]  # 1-row bound, driver-safe
    lo, hi = mx * 2 // 5, mx // 2  # integer arithmetic on both engines
    pruned, n_total, n_read = vt.read_pruned("o_orderkey", lo, hi)
    assert n_read < n_total, (
        f"zone maps pruned nothing ({n_read}/{n_total}) — range layout broken"
    )
    return (
        pruned.filter(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum("o_totalprice").alias("sum_totalprice"),
        )
    )


@spark_query(
    "q_lakehouse_vacuum",
    oracle="""
WITH upd AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
),
v1 AS (
  SELECT c.c_custkey,
         CASE WHEN u.c_custkey IS NOT NULL THEN 'URGENT-VIP'
              ELSE c.c_mktsegment END                        AS c_mktsegment,
         CASE WHEN u.c_custkey IS NOT NULL THEN c.c_acctbal + u.n_urgent
              ELSE c.c_acctbal END                           AS c_acctbal
  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_mktsegment = 'URGENT-VIP' THEN 1 ELSE 0 END) AS BIGINT) AS n_vip,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_acctbal,
       CAST(1 AS BIGINT) AS versions_expired,
       TRUE AS files_reclaimed,
       TRUE AS expired_version_unreadable
FROM v1
""",
)
def q_lakehouse_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM / expire_snapshots: the table-maintenance step that
    completes the triad with compaction (q_sink_compaction) and
    clustering (q_zorder_layout) — copy-on-write MERGE strands a full
    generation of data files per commit, and at 100 TB un-vacuumed
    churn doubles storage per rewrite cycle.

    This builds its OWN table (create v0, merge v1 — never the shared
    demo table, whose older snapshots other queries time-travel to),
    vacuums with retain_last=1, and verifies the three contracts:
    (1) the surviving snapshot is byte-identical to the oracle's
    recomputed v1 state (the hash-matched columns); (2) storage was
    actually reclaimed (merge rewrites every file, so v0's generation
    must go); (3) time travel to the expired v0 now fails at MANIFEST
    resolution — manifests are deleted before data files, so a reader
    can never resolve a manifest whose files are gone.

    The boolean/count audit columns are literals in the oracle by
    design: they assert runtime behavior the SQL engine cannot see
    (file deletion, failed time travel); the Spark side computes them
    from the real vacuum audit and a real failed read."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(customer)
    vt.merge(
        _urgent_updates(spark, sf_dir),
        "c_custkey",
        {
            "c_mktsegment": F.lit("URGENT-VIP"),
            "c_acctbal": F.col("c_acctbal") + F.col("n_urgent"),
        },
    )
    # grace_seconds=0: this demo table is single-writer by construction,
    # so immediate reclamation is safe and keeps the audit deterministic.
    audit = vt.vacuum(retain_last=1, grace_seconds=0.0)
    files_reclaimed, expired_unreadable = _vacuum_booleans(vt, audit, 0)
    return (
        vt.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("c_mktsegment") == "URGENT-VIP", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_vip"),
            _money_sum("c_acctbal").alias("sum_acctbal"),
        )
        .select(
            "n_rows",
            "n_vip",
            "sum_acctbal",
            F.lit(audit["versions_expired"]).cast("bigint").alias("versions_expired"),
            F.lit(files_reclaimed).alias("files_reclaimed"),
            F.lit(expired_unreadable).alias("expired_version_unreadable"),
        )
    )


def _vacuum_booleans(vt, audit: dict, expired_version: int) -> tuple[bool, bool]:
    """The two vacuum laws, from the REAL audit and a REAL read probe:
    (1) storage was actually reclaimed, (2) time travel to the expired
    version now fails at manifest resolution.  Module-level so the
    negative-control test can run them after a NO-OP vacuum
    (retain_last past the version count) and prove both flip FALSE
    (r11 VERDICT #1)."""
    try:
        vt.read(expired_version)
        expired_unreadable = False
    except FileNotFoundError:
        expired_unreadable = True
    reclaimed = bool(audit["files_removed"] > 0 and audit["bytes_reclaimed"] > 0)
    return reclaimed, expired_unreadable


@spark_query(
    "q_lakehouse_delete_vectors",
    oracle="""
WITH remaining AS (
  SELECT c_custkey, c_mktsegment, c_acctbal
  FROM customer
  WHERE NOT (c_acctbal < 0) AND NOT (c_mktsegment = 'MACHINERY')
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_machinery_left,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_acctbal,
       CAST(2 AS BIGINT) AS n_delete_files,
       TRUE AS data_files_untouched,
       TRUE AS compact_materializes
FROM remaining
""",
)
def q_lakehouse_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ deletes via position delete vectors — the
    write-cheap half of the lakehouse deletion story (vtable.merge is
    the copy-on-write half): two successive DELETEs (negative-balance
    customers, then the MACHINERY segment) each commit a new version
    that records only (file, row_position) pairs in a kilobyte-scale
    side file; NOT ONE data file is rewritten.  Readers subtract the
    accumulated DVs with a stats-gated broadcast anti-join on
    (_metadata file, row_index).  compact() then MATERIALIZES the
    deletes — its snapshot read already applies DVs, so the rewrite
    it commits is DV-free (minor compaction), bounding read-side
    anti-join debt.

    Hash-matched columns: the surviving rows' count/aggregate vs the
    oracle's recomputed double-DELETE state — so DV capture, DV
    accumulation across versions, and read-time subtraction are all
    on the verified path.  Audit literals assert what SQL cannot see:
    the data-file sets of v0..v2 are IDENTICAL (untouched by both
    deletes), exactly 2 delete files accumulated, and the compacted
    snapshot equals the DV-applied one."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    vt = VersionedTable(spark, _fresh_table_dir())
    vt.create(customer)
    files_v0 = set(vt._read_manifest(0)["files"])
    vt.delete_where(F.col("c_acctbal") < 0)
    vt.delete_where(F.col("c_mktsegment") == "MACHINERY")
    m2 = vt._read_manifest(2)
    untouched = _data_files_untouched(vt, files_v0, [1, 2])
    n_dv = len(m2.get("deletes", []))
    snapshot = vt.read(2)
    n_after_dv = snapshot.count()
    vt.compact()
    compact_ok = _compact_materializes(vt, 3, n_after_dv)
    return snapshot.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0))
        .cast("bigint")
        .alias("n_machinery_left"),
        _money_sum("c_acctbal").alias("sum_acctbal"),
    ).select(
        "n_rows",
        "n_machinery_left",
        "sum_acctbal",
        F.lit(n_dv).cast("bigint").alias("n_delete_files"),
        F.lit(untouched).alias("data_files_untouched"),
        F.lit(compact_ok).alias("compact_materializes"),
    )


def _data_files_untouched(vt, baseline_files: set, versions: list[int]) -> bool:
    """Merge-on-read law: a DV delete commits only a side file — the
    listed versions' DATA file sets must equal the baseline's exactly.
    Module-level so the negative-control test can run it after a
    copy-on-write MERGE (which rewrites files) and prove it flips
    FALSE (r11 VERDICT #1)."""
    return all(
        set(vt._read_manifest(v)["files"]) == set(baseline_files)
        for v in versions
    )


def _compact_materializes(vt, version: int, expected_rows: int) -> bool:
    """Compaction law: the rewritten snapshot carries NO delete
    vectors and exactly reproduces the DV-applied row count.
    Module-level so the negative-control test can run it against a
    version that still carries DVs and prove it flips FALSE."""
    m = vt._read_manifest(version)
    return bool(
        m.get("deletes", []) == [] and vt.read(version).count() == expected_rows
    )
