"""Tests for MI feature ranking, probability calibration, Wilcoxon
signed-rank, and the vtable VACUUM maintenance op."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from antidote_data_framework_spark.sources import load_table
from antidote_data_framework_spark.sources.vtable import VersionedTable

QUERIES = entrymod.queries()


def test_mi_ranking_laws_and_replay(spark, sf_dir):
    rows = QUERIES["q_mi_feature_ranking"](spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {
        "user_bucket",
        "day_of_week",
        "value_quartile",
    }
    mis = [r["mi_nats"] for r in rows]
    assert mis == sorted(mis, reverse=True)
    for r in rows:
        assert r["mi_nats"] >= -1e-9  # MI is nonnegative
        assert -1e-9 <= r["nmi"] <= 1.0 + 1e-9  # bounded by H(T)
    # independent replay of the user_bucket feature's MI
    cells = duckdb.sql(
        "SELECT user_id % 10 f, event_type t, COUNT(*) n FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    n_tot = sum(n for _, _, n in cells)
    nf: dict[int, int] = {}
    nt: dict[str, int] = {}
    for f, t, n in cells:
        nf[f] = nf.get(f, 0) + n
        nt[t] = nt.get(t, 0) + n
    mi = sum(
        (n / n_tot) * math.log(n * n_tot / (nf[f] * nt[t]))
        for f, t, n in cells
    )
    got = next(r for r in rows if r["feature"] == "user_bucket")
    assert abs(got["mi_nats"] - mi) < 1e-5
    assert got["n_cells"] == len(cells)


def test_calibration_brier_matches_replay(spark, sf_dir):
    rows = QUERIES["q_prob_calibration"](spark, sf_dir).collect()
    assert rows
    evs = duckdb.sql(
        "SELECT user_id, CASE WHEN event_type='purchase' THEN 1 ELSE 0 END y "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    gn, gs = len(evs), sum(y for _, y in evs)
    per: dict[int, list[int]] = {}
    for u, y in evs:
        per.setdefault(u, []).append(y)
    p0 = gs / gn
    by_bin: dict[int, list[tuple[float, int]]] = {}
    for u, ys in per.items():
        nu, su = len(ys), sum(ys)
        for y in ys:
            phat = (su - y + 50.0 * p0) / (nu - 1.0 + 50.0)
            b = min(9, int(phat * 10))
            by_bin.setdefault(b, []).append((phat, y))
    assert {r["decile"] for r in rows} == set(by_bin)
    for r in rows:
        pts = by_bin[r["decile"]]
        assert r["n_events"] == len(pts)
        assert abs(r["mean_pred"] - sum(p for p, _ in pts) / len(pts)) < 1e-5
        assert abs(r["obs_rate"] - sum(y for _, y in pts) / len(pts)) < 1e-5
        brier = sum((p - y) ** 2 for p, y in pts) / len(pts)
        assert abs(r["brier"] - brier) < 1e-5


def test_wilcoxon_matches_python_replay(spark, sf_dir):
    pairs = duckdb.sql(
        """
        SELECT user_id,
          SUM(CASE WHEN event_type='purchase' THEN CAST(ROUND(value*100,0) AS BIGINT) END) sp,
          COUNT(CASE WHEN event_type='purchase' THEN 1 END) np,
          SUM(CASE WHEN event_type='click' THEN CAST(ROUND(value*100,0) AS BIGINT) END) sc,
          COUNT(CASE WHEN event_type='click' THEN 1 END) nc
        FROM read_parquet('{p}/events.parquet')
        WHERE event_type IN ('purchase','click') GROUP BY user_id
        HAVING np > 0 AND nc > 0
        """.format(p=sf_dir)
    ).fetchall()
    ds = [
        (sp / np - sc / nc, u) for u, sp, np, sc, nc in pairs if sp / np != sc / nc
    ]
    ds.sort(key=lambda x: (abs(x[0]), x[1]))
    w_plus = sum(i + 1 for i, (d, _) in enumerate(ds) if d > 0)
    n = len(ds)
    out = QUERIES["q_wilcoxon_signed_rank"](spark, sf_dir).collect()[0]
    assert out["n"] == n
    assert out["w_plus"] == w_plus
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    assert abs(out["z_score"] - z) < 5e-4


def test_vacuum_reclaims_and_preserves_retained(spark, sf_dir, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vt.create(nat)
    vt.append(nat.limit(3))
    vt.compact()
    assert vt.latest_version() == 2
    before = set(f for f in __import__("os").listdir(vt.data_dir))
    audit = vt.vacuum(retain_last=2, grace_seconds=0.0)
    assert audit["versions_expired"] == 1
    assert audit["files_removed"] >= 0
    # retained versions still read fine and byte-agree
    assert vt.read(2).count() == vt.read(1).count() == 28
    with pytest.raises(FileNotFoundError):
        vt.read(0)
    # every file named by retained manifests survived
    import os

    live = set(vt._read_manifest(1)["files"]) | set(vt._read_manifest(2)["files"])
    now = set(os.listdir(vt.data_dir))
    assert live <= now
    assert now <= before
    # vacuum retain_last=1 then only v2's files remain
    vt.vacuum(retain_last=1, grace_seconds=0.0)
    only = set(vt._read_manifest(2)["files"])
    assert set(f for f in os.listdir(vt.data_dir) if f.endswith(".parquet")) == only


def test_delete_vectors_subtract_without_rewrite(spark, sf_dir):
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, "/tmp/dv_test_" + __import__("uuid").uuid4().hex)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    vt.create(cust)
    n0 = vt.read().count()
    files0 = sorted(vt._read_manifest(0)["files"])
    vt.delete_where(F.col("c_custkey") % 10 == 3)
    # data files untouched, one DV recorded
    m1 = vt._read_manifest(1)
    assert sorted(m1["files"]) == files0
    assert len(m1["deletes"]) == 1
    expect = cust.filter(~(F.col("c_custkey") % 10 == 3)).count()
    assert vt.read().count() == expect
    # time travel to v0 still sees everything
    assert vt.read(0).count() == n0
    # deleting already-deleted rows is a no-op on the visible set
    vt.delete_where(F.col("c_custkey") % 10 == 3)
    assert vt.read().count() == expect
    # compact materializes: no deletes in the new manifest, same rows
    vt.compact()
    m = vt._read_manifest(vt.latest_version())
    assert m.get("deletes", []) == []
    assert vt.read().count() == expect
    # vacuum keeps the retained snapshot intact and drops stale DVs
    vt.vacuum(retain_last=1, grace_seconds=0.0)
    import os

    assert vt.read().count() == expect
    if os.path.isdir(vt.deletes_dir):
        assert os.listdir(vt.deletes_dir) == []
    import shutil

    shutil.rmtree(vt.path, ignore_errors=True)


def test_avro_codec_roundtrip_unit():
    """Container-level law: arbitrary (long, string, double) rows
    survive write->read byte-exactly, across block boundaries."""
    import os
    import uuid

    from antidote_data_framework_spark.sources.avro_py import (
        read_container,
        write_container,
    )

    rows = [
        {"a": (-1) ** i * (7**i % 10**12), "b": f"v{i}" * (i % 5), "c": i / 7.0}
        for i in range(37)
    ]
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
        ],
    }
    path = f"/tmp/avro_unit_{uuid.uuid4().hex}.avro"
    write_container(path, schema, rows, records_per_block=4)
    s2, back = read_container(open(path, "rb").read())
    os.unlink(path)
    assert back == rows
    assert s2["fields"][0]["name"] == "a"
