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


def test_concurrent_commit_conflict_detected(spark, vt):
    vt.create(_df(spark, [(1, "a", 1.0)]))
    # another committer wins version 1 between our read and publish
    with open(vt._manifest_path(1), "w") as fh:
        fh.write('{"version": 1, "op": "append", "files": []}')
    real_latest = vt.latest_version

    class Stale:
        def latest_version(self):
            return 0

    vt.latest_version = Stale().latest_version  # simulate stale read
    try:
        with pytest.raises(FileExistsError):
            vt.append(_df(spark, [(2, "b", 2.0)]))
    finally:
        vt.latest_version = real_latest


def test_append_retries_through_commit_conflict(spark, vt):
    """A blind append is valid against any snapshot: when another
    committer wins the race for the next version, append rebuilds the
    manifest against the new latest and succeeds."""
    vt.create(_df(spark, [(1, "a", 1.0)]))
    real_commit = vt._commit
    calls = {"n": 0}

    def racing_commit(files, op):
        # first attempt loses the race: someone else takes the version
        if op == "append" and calls["n"] == 0:
            calls["n"] += 1
            v = vt.latest_version() + 1
            with open(vt._manifest_path(v), "w") as fh:
                fh.write(
                    '{"version": %d, "op": "append", "files": %s}'
                    % (v, str(vt._read_manifest(v - 1)["files"]).replace("'", '"'))
                )
            return real_commit(files, op)  # raises FileExistsError
        return real_commit(files, op)

    vt._commit = racing_commit
    try:
        ver = vt.append(_df(spark, [(2, "b", 2.0)]))
    finally:
        vt._commit = real_commit
    assert ver == 2  # v1 went to the racer, our append landed at v2
    assert vt.read().count() == 2


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
