"""VersionedTable (sources/vtable.py) semantics: ordered manifest log,
snapshot isolation, time travel, MERGE, and commit-conflict detection."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from antidote_data_framework_spark.sources.vtable import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, seg STRING, val DOUBLE")


def test_create_append_history_and_time_travel(spark, vt):
    assert vt.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)])) == 0
    assert vt.append(_df(spark, [(3, "c", 3.0)])) == 1
    assert [m["op"] for m in vt.history()] == ["create", "append"]
    assert vt.read().count() == 3
    assert vt.read(0).count() == 2  # time travel: v0 unchanged


def test_merge_updates_matched_rows_only(spark, vt):
    vt.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    upd = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k BIGINT, bump DOUBLE")
    vt.merge(upd, "k", {"val": F.col("val") + F.col("bump"), "seg": F.lit("m")})
    got = {r.k: (r.seg, r.val) for r in vt.read().collect()}
    assert got == {1: ("m", 11.0), 2: ("b", 2.0), 3: ("m", 33.0)}
    # the pre-merge snapshot is still readable byte-for-byte
    v0 = {r.k: (r.seg, r.val) for r in vt.read(0).collect()}
    assert v0 == {1: ("a", 1.0), 2: ("b", 2.0), 3: ("c", 3.0)}


def test_stray_data_files_are_invisible(spark, vt):
    vt.create(_df(spark, [(1, "a", 1.0)]))
    # a writer crashed after writing data but before committing a
    # manifest: readers must not see the orphan file
    _df(spark, [(99, "zz", 9.0)]).write.parquet(
        os.path.join(vt.data_dir, "orphan.parquet")
    )
    assert vt.read().count() == 1


def _inject_racer_commit(vt, version: int) -> None:
    """Simulate another committer winning ``version``: its manifest
    carries the previous snapshot's files (a no-op append)."""
    import json

    prev = vt._read_manifest(version - 1)["files"]
    with open(vt._manifest_path(version), "w") as fh:
        json.dump({"version": version, "op": "racer", "files": prev}, fh)


def test_concurrent_commit_conflict_detected(spark, vt):
    """A commit computed against a stale snapshot must raise, never
    silently publish over the racer (the lost-update hole)."""
    vt.create(_df(spark, [(1, "a", 1.0)]))
    base = vt.latest_version()
    files = vt._read_manifest(base)["files"]
    _inject_racer_commit(vt, base + 1)  # racer wins version base+1
    with pytest.raises(FileExistsError):
        vt._commit(files, "append", base + 1)
    # and merge (no-retry contract) surfaces the conflict to the caller
    real_commit = vt._commit
    vt._commit = lambda f, op, v: (_inject_racer_commit(vt, v), real_commit(f, op, v))[1]
    try:
        with pytest.raises(FileExistsError):
            vt.merge(
                spark.createDataFrame([(1, 9.0)], "k BIGINT, bump DOUBLE"),
                "k",
                {"val": F.col("val") + F.col("bump")},
            )
    finally:
        vt._commit = real_commit


def test_append_retries_through_commit_conflict(spark, vt):
    """A blind append is valid against any snapshot: when another
    committer wins the race for the next version, append re-reads the
    new latest, rebuilds the manifest, and succeeds on retry — with
    BOTH writers' rows in the final snapshot (no lost update)."""
    vt.create(_df(spark, [(1, "a", 1.0)]))
    real_commit = vt._commit
    state = {"raced": False}

    def racing_commit(files, op, version, **kw):
        if op == "append" and not state["raced"]:
            state["raced"] = True
            _inject_racer_commit(vt, version)  # racer beats us to `version`
        return real_commit(files, op, version, **kw)

    vt._commit = racing_commit
    try:
        ver = vt.append(_df(spark, [(2, "b", 2.0)]))
    finally:
        vt._commit = real_commit
    assert state["raced"]
    assert ver == 2  # v1 went to the racer, our append landed at v2
    # lost-update check: the racer's snapshot files AND ours are present
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]
    assert [m["op"] for m in vt.history()] == ["create", "racer", "append"]


def test_compact_preserves_rows_and_shrinks_files(spark, vt):
    vt.create(_df(spark, [(1, "a", 1.0)]).repartition(4))
    vt.append(_df(spark, [(2, "b", 2.0)]).repartition(4))
    before_files = len(vt._read_manifest(vt.latest_version())["files"])
    assert before_files > 1
    vt.compact(target_partitions=1)
    manifest = vt._read_manifest(vt.latest_version())
    assert manifest["op"] == "compact"
    assert len(manifest["files"]) == 1
    got = sorted((r.k, r.seg, r.val) for r in vt.read().collect())
    assert got == [(1, "a", 1.0), (2, "b", 2.0)]


def test_zonemap_stats_recorded_and_pruning_is_exact(spark, vt):
    """collect_stats=True records per-file footer zone maps in the
    manifest; read_pruned keeps exactly the overlapping files and the
    pruned scan + real predicate equals the full scan + predicate."""
    import pyspark.sql.functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.lit("x").alias("seg"),
        (F.col("id") * 1.5).alias("val"),
    )
    vt.create(df.repartitionByRange(5, "k"), collect_stats=True)
    manifest = vt._read_manifest(vt.latest_version())
    assert set(manifest["stats"]) == set(manifest["files"])
    for st in manifest["stats"].values():
        assert "k" in st and st["k"][0] <= st["k"][1]

    pruned, total, read = vt.read_pruned("k", 100, 299)
    assert total == 5 and 1 <= read < total
    got = sorted(r.k for r in pruned.filter(F.col("k").between(100, 299)).collect())
    assert got == list(range(100, 300))

    # empty overlap: schema preserved, zero rows, zero files matched
    empty, _, read0 = vt.read_pruned("k", 5000, 6000)
    assert empty.columns == pruned.columns and empty.count() == 0

    # column without stats: conservative — nothing pruned
    _, tot2, read2 = vt.read_pruned("no_such_col", 0, 1)
    assert read2 == tot2


def test_zonemap_query_prunes_files(spark, sf_dir):
    """The registered zone-map query must actually skip files (its
    in-query assert) and agree with a direct computation."""
    import __spark_entry__ as entrymod
    import pyspark.sql.functions as F
    from antidote_data_framework_spark.sources import load_table

    out = entrymod.queries()["q_lakehouse_zonemap_skip"](spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderkey")).first()[0]
    expect = (
        orders.filter(F.col("o_orderkey").between(mx * 2 // 5, mx // 2))
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    got = {r["o_orderpriority"]: r["n_orders"] for r in out.collect()}
    assert got == {r["o_orderpriority"]: r["count"] for r in expect}


def test_multi_predicate_pruning_is_conjunctive(spark, vt):
    """read_pruned_all keeps only files overlapping EVERY range, and
    never prunes on a column without stats."""
    import pyspark.sql.functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("long").alias("g"),
        (F.col("id") * 1.5).alias("val"),
    )
    vt.create(df.repartitionByRange(5, "k"), collect_stats=True)

    # k-range alone keeps a strict subset; adding a g-range that every
    # file satisfies (g spans 0-9 in each file) must not prune further
    _, tot, read_k = vt.read_pruned_all({"k": (0, 99)})
    _, _, read_kg = vt.read_pruned_all({"k": (0, 99), "g": (0, 9)})
    assert read_k < tot and read_kg == read_k

    # an impossible second range prunes everything
    empty, _, read0 = vt.read_pruned_all({"k": (0, 99), "g": (50, 60)})
    assert read0 == 0 and empty.count() == 0

    # equivalence: pruned scan + real predicate == full scan + predicate
    pruned, _, _ = vt.read_pruned_all({"k": (100, 299), "g": (2, 5)})
    want = (
        vt.read()
        .filter(F.col("k").between(100, 299) & F.col("g").between(2, 5))
        .count()
    )
    got = pruned.filter(
        F.col("k").between(100, 299) & F.col("g").between(2, 5)
    ).count()
    assert got == want > 0


def test_delete_then_append_does_not_resurrect(spark, vt):
    """r5 ADVICE-high regression: append/append_idempotent must carry
    the base manifest's delete-vector list forward — an append never
    touches existing files, so their DVs stay valid.  Before the fix,
    rebuilding the manifest from files alone resurrected every
    delete_where'd row on the next append."""
    vt.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    vt.delete_where(F.col("k") == 2)
    assert sorted(r.k for r in vt.read().collect()) == [1, 3]

    vt.append(_df(spark, [(4, "d", 4.0)]))
    assert sorted(r.k for r in vt.read().collect()) == [1, 3, 4]

    vt.append_idempotent(_df(spark, [(5, "e", 5.0)]), tag="append-b0")
    assert sorted(r.k for r in vt.read().collect()) == [1, 3, 4, 5]
    # replaying the same tag is a no-op and still doesn't resurrect
    assert vt.append_idempotent(_df(spark, [(5, "e", 5.0)]), tag="append-b0") is None
    assert sorted(r.k for r in vt.read().collect()) == [1, 3, 4, 5]


def test_vacuum_grace_window_spares_fresh_unreferenced_files(spark, vt):
    """r5 ADVICE-medium regression: _write_data_files publishes parquet
    BEFORE the manifest commit, so vacuum must not delete fresh
    unreferenced files (they may belong to an in-flight writer).  With
    the default grace window a just-staged file survives; with
    grace_seconds=0 (explicit single-writer assertion) it is
    reclaimed."""
    vt.create(_df(spark, [(1, "a", 1.0)]))
    # simulate an in-flight writer: data files staged, manifest not yet committed
    staged = vt._write_data_files(_df(spark, [(9, "z", 9.0)]))
    audit = vt.vacuum(retain_last=1)  # default grace
    assert audit["files_removed"] == 0
    for f in staged:
        assert os.path.exists(os.path.join(vt.data_dir, f))
    # the in-flight writer can still commit and read its data
    base = vt.latest_version()
    vt._commit(vt._read_manifest(base)["files"] + staged, "append", base + 1)
    assert sorted(r.k for r in vt.read().collect()) == [1, 9]

    # now orphan a generation and show grace_seconds=0 reclaims it
    vt.compact()
    audit = vt.vacuum(retain_last=1, grace_seconds=0.0)
    assert audit["files_removed"] > 0
