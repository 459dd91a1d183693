"""Minimal versioned parquet table — a self-contained lakehouse core.

The container ships no Delta/Iceberg/Hudi jars (sources/lakehouse.py
probes for them), but the STRUCTURE those formats add over a parquet
directory — an ordered manifest log, atomic commits, snapshot
isolation, MERGE, time travel — is format logic, not jar logic.  This
module implements that core with the stdlib + plain parquet:

    <table>/
      _manifests/v00000.json   ordered commit log: one JSON per
      _manifests/v00001.json   version listing the snapshot's data
      ...                      files + the operation that made it
      data/<version>-<uuid>.parquet   immutable data files

Commit protocol (the Delta/Iceberg idea in stdlib form): data files
are written first and are invisible until a manifest names them; the
manifest is staged to a temp name and published with ``os.link`` to
its final version-numbered name — link FAILS if the version already
exists, which is exactly optimistic-concurrency conflict detection.
Readers resolve a manifest (latest or any historical version) and
read only the files it names: snapshot isolation and time travel fall
out of immutability.

MERGE is copy-on-write: the new snapshot rewrites the table with the
updates applied (anti-join + union of matched/unmatched), and commits
it as one new version.  At 100 TB the rewrite narrows to only the
data files whose key ranges intersect the updates (file-level
statistics pruning) — same protocol, smaller rewrite set.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hints import broadcast_bounded


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest_dir = os.path.join(path, "_manifests")
        self.data_dir = os.path.join(path, "data")
        self.deletes_dir = os.path.join(path, "deletes")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ---- manifest log ------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:05d}.json")

    def latest_version(self) -> int:
        versions = [
            int(f[1:6])
            for f in os.listdir(self.manifest_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else -1

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _commit(
        self,
        files: list[str],
        op: str,
        version: int,
        stats: dict | None = None,
        deletes: list[str] | None = None,
    ) -> int:
        """Atomically publish ``version`` naming ``files``.  The caller
        passes the version it computed AGAINST ITS SNAPSHOT (base + 1):
        recomputing latest here would silently publish on top of a
        concurrent commit and drop its files (lost update).  os.link
        refuses to overwrite, so two committers racing for the same
        version number get exactly one winner — the loser sees
        FileExistsError and must re-read the new snapshot.

        ``stats`` (optional) carries per-file column zone maps
        ({file: {col: [min, max]}}) into the manifest — the Delta
        add-file stats / Iceberg manifest-entry idea that makes
        file skipping a MANIFEST read, not a footer crawl."""
        manifest = {"version": version, "op": op, "files": sorted(files)}
        if stats:
            manifest["stats"] = {f: stats[f] for f in sorted(stats)}
        if deletes:
            manifest["deletes"] = sorted(deletes)
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, self._manifest_path(version))  # atomic, fails if exists
        finally:
            os.unlink(tmp)
        return version

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in range(self.latest_version() + 1)]

    # ---- data files --------------------------------------------------------

    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable parquet files under data/ and
        return their names (not yet visible to any reader)."""
        staging = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        df.write.parquet(staging)
        out = []
        prefix = uuid.uuid4().hex[:8]
        for i, f in enumerate(sorted(os.listdir(staging))):
            if not f.endswith(".parquet"):
                continue
            name = f"{prefix}-{i:04d}.parquet"
            os.rename(os.path.join(staging, f), os.path.join(self.data_dir, name))
            out.append(name)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return out

    def _footer_stats(self, filename: str) -> dict:
        """Per-column [min, max] zone map of one data file, read from
        the PARQUET FOOTER via pyarrow — row-group statistics the
        writer already computed; no data pages are read.  Columns
        whose stats aren't JSON-scalar (nested, binary, temporal) are
        simply absent — skipping must stay conservative."""
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(os.path.join(self.data_dir, filename)).metadata
        stats: dict[str, list] = {}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                name = col.path_in_schema
                lo, hi = st.min, st.max
                if not all(isinstance(v, (int, float, str)) for v in (lo, hi)):
                    continue
                if name in stats:
                    stats[name] = [min(stats[name][0], lo), max(stats[name][1], hi)]
                else:
                    stats[name] = [lo, hi]
        return stats

    # ---- operations --------------------------------------------------------

    def create(self, df: DataFrame, collect_stats: bool = False) -> int:
        base = self.latest_version()
        files = self._write_data_files(df)
        stats = {f: self._footer_stats(f) for f in files} if collect_stats else None
        return self._commit(files, "create", base + 1, stats=stats)

    def append(self, df: DataFrame, retries: int = 3) -> int:
        """Append with optimistic-concurrency retry: a blind append is
        valid against ANY snapshot, so on a commit conflict the data
        files are reused and only the manifest is rebuilt against the
        new latest version.  (MERGE deliberately has no retry: its
        rewrite is computed against a specific snapshot, so a conflict
        must surface to the caller, who re-runs against the winner —
        the same contract Delta/Iceberg give serializable writers.)

        The FULL base manifest is carried forward — data files AND the
        position-delete-vector list AND per-file stats.  Rebuilding
        from ``files`` alone would silently resurrect every row
        removed by ``delete_where`` (the r5 ADVICE-high bug): an
        append never touches existing files, so existing DVs stay
        exactly as valid as before the append."""
        new_files = self._write_data_files(df)
        for attempt in range(retries + 1):
            base = self.latest_version()
            prev = self._read_manifest(base)
            try:
                return self._commit(
                    prev["files"] + new_files,
                    "append",
                    base + 1,
                    stats=prev.get("stats"),
                    deletes=prev.get("deletes"),
                )
            except FileExistsError:
                if attempt == retries:
                    raise

    def append_idempotent(self, df: DataFrame, tag: str) -> int | None:
        """Exactly-once streaming sink hook (foreachBatch contract):
        the commit records ``tag`` (e.g. ``append-b<batchId>``) as its
        operation, and a replay of an already-committed tag is a
        NO-OP — micro-batch retries cannot double-ingest.  This is the
        txn-id dedup idea Delta/Iceberg streaming sinks use."""
        if any(m["op"] == tag for m in self.history()):
            return None
        new_files = self._write_data_files(df)
        base = self.latest_version()
        prev = self._read_manifest(base) if base >= 0 else {"files": []}
        return self._commit(
            prev["files"] + new_files,
            tag,
            base + 1,
            stats=prev.get("stats"),
            deletes=prev.get("deletes"),
        )

    def compact(self, target_partitions: int = 1) -> int:
        """Rewrite the current snapshot into ``target_partitions``
        files and commit it as a new version — the lakehouse answer to
        the small-files problem (many tiny parquet files from
        micro-batch appends destroy scan throughput; row-group-sized
        files restore it).  Logically a no-op: readers of the new
        version see identical rows."""
        base = self.latest_version()
        current = self.read(base).coalesce(target_partitions)
        return self._commit(self._write_data_files(current), "compact", base + 1)

    def delete_where(self, condition) -> int:
        """MERGE-ON-READ row deletion via POSITION DELETE VECTORS —
        the Iceberg v2 / Delta deletion-vector pattern: instead of
        rewriting every data file that contains a matching row
        (copy-on-write, what merge() does), record the (file,
        row-position) pairs of deleted rows in a tiny side file and
        subtract them at read time.  At 100 TB this turns a deletion
        of 0.1% of rows from a full-table rewrite into writing
        kilobytes — the only sane way to honor GDPR erasure or
        late-arriving retractions on a petabyte table.

        Positions come from the parquet scan's `_metadata.row_index`
        (stable per file: row-group order), so the DV is computed by
        ONE filtered scan with zero shuffle.  Commits a new version
        whose manifest lists the SAME data files plus the accumulated
        delete files; read() applies them as an anti-join."""
        base = self.latest_version()
        manifest = self._read_manifest(base)
        os.makedirs(self.deletes_dir, exist_ok=True)
        raw = self.spark.read.parquet(
            *[os.path.join(self.data_dir, f) for f in manifest["files"]]
        )
        dv = (
            raw.filter(condition)
            .select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("_file"),
                F.col("_metadata.row_index").alias("_pos"),
            )
        )
        staging = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        dv.coalesce(1).write.parquet(staging)
        name = f"dv-{uuid.uuid4().hex[:8]}.parquet"
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staging, f), os.path.join(self.deletes_dir, name)
                )
                break
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        version = base + 1
        new_manifest = {
            "version": version,
            "op": "delete",
            "files": manifest["files"],
            "deletes": manifest.get("deletes", []) + [name],
        }
        if "stats" in manifest:
            new_manifest["stats"] = manifest["stats"]
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(new_manifest, fh)
        try:
            os.link(tmp, self._manifest_path(version))
        finally:
            os.unlink(tmp)
        return version

    def vacuum(self, retain_last: int = 1, grace_seconds: float = 3600.0) -> dict:
        """Physically delete data files referenced ONLY by versions
        older than the ``retain_last`` most recent snapshots, and drop
        those versions' manifests — the Delta VACUUM / Iceberg
        expire_snapshots maintenance step that bounds storage after
        copy-on-write churn (every merge/compact strands a full
        generation of files).

        Safety order matters: old manifests are removed FIRST, so a
        concurrent time-travel reader either resolves a manifest and
        finds every file it names still present, or fails cleanly at
        manifest resolution — never a manifest pointing at deleted
        parquet.  Files named by ANY retained manifest are kept even
        if an older manifest also names them (liveness is a set union
        over retained versions, not per-version ownership).

        Returns an audit dict: files/bytes before, removed, retained
        versions.  Time travel to an expired version raises
        FileNotFoundError afterwards — by design.

        ``grace_seconds`` is the Delta-VACUUM-style retention window
        (r5 ADVICE-medium): ``_write_data_files`` publishes parquet
        into data/ BEFORE the manifest commit, so an unreferenced file
        may belong to an in-flight writer, and deleting it would let
        that writer commit a manifest naming missing parquet
        (permanent data loss).  A candidate is only deleted once its
        mtime is older than the window — any sane in-flight commit
        finishes well within it.  Pass ``grace_seconds=0.0`` only when
        the caller guarantees no concurrent writer (tests, single-user
        maintenance)."""
        import time

        cutoff = time.time() - grace_seconds
        latest = self.latest_version()
        keep_from = max(0, latest - retain_last + 1)
        live: set[str] = set()
        live_dv: set[str] = set()
        for v in range(keep_from, latest + 1):
            m = self._read_manifest(v)
            live |= set(m["files"])
            live_dv |= set(m.get("deletes", []))
        expired_manifests = list(range(0, keep_from))
        for v in expired_manifests:
            try:
                os.unlink(self._manifest_path(v))
            except FileNotFoundError:
                pass  # already vacuumed
        all_files = [
            f for f in os.listdir(self.data_dir) if f.endswith(".parquet")
        ]
        removed, reclaimed = [], 0
        for f in all_files:
            if f not in live:
                p = os.path.join(self.data_dir, f)
                try:
                    if os.path.getmtime(p) > cutoff:
                        continue  # possibly an in-flight writer's staged file
                    reclaimed += os.path.getsize(p)
                    os.unlink(p)
                    removed.append(f)
                except FileNotFoundError:
                    pass
        if os.path.isdir(self.deletes_dir):
            for f in os.listdir(self.deletes_dir):
                if f.endswith(".parquet") and f not in live_dv:
                    p = os.path.join(self.deletes_dir, f)
                    try:
                        if os.path.getmtime(p) > cutoff:
                            continue
                        reclaimed += os.path.getsize(p)
                        os.unlink(p)
                        removed.append(f)
                    except FileNotFoundError:
                        pass
        return {
            "files_before": len(all_files),
            "files_removed": len(removed),
            "bytes_reclaimed": reclaimed,
            "versions_expired": len(expired_manifests),
            "retained_from": keep_from,
        }

    def merge(self, updates: DataFrame, on: str, set_exprs: dict) -> int:
        """Copy-on-write MERGE ... WHEN MATCHED THEN UPDATE: rows whose
        ``on`` key appears in ``updates`` get ``set_exprs`` applied
        (expressions may reference the update columns); unmatched rows
        pass through byte-identical.  Commits one new snapshot."""
        base = self.latest_version()
        current = self.read(base)
        matched = current.join(updates, on, "inner")
        for col, expr in set_exprs.items():
            matched = matched.withColumn(col, expr)
        matched = matched.select(*current.columns)
        unmatched = current.join(updates, on, "left_anti")
        return self._commit(
            self._write_data_files(matched.unionByName(unmatched)), "merge", base + 1
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read — latest by default, any version for time
        travel.  Only the manifest's files are scanned; stray or
        in-flight data files are invisible (snapshot isolation)."""
        v = self.latest_version() if version is None else version
        manifest = self._read_manifest(v)
        files = manifest["files"]
        df = self.spark.read.parquet(
            *[os.path.join(self.data_dir, f) for f in files]
        )
        dels = manifest.get("deletes", [])
        if not dels:
            return df
        # Merge-on-read: subtract the position-delete vectors.  The
        # DV relation is bounded by rows-deleted-since-last-rewrite
        # (kilobytes in steady state), so it is broadcast when small
        # (measured, stats-gated) and shuffles only if someone deleted
        # a large fraction of the table -- at which point compact()
        # should materialize anyway.
        dv = self.spark.read.parquet(
            *[os.path.join(self.deletes_dir, d) for d in dels]
        )
        cols = df.columns
        with_pos = df.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        return with_pos.join(
            broadcast_bounded(dv, dv.count()), ["_file", "_pos"], "left_anti"
        ).select(*cols)

    def read_pruned(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Snapshot read with MANIFEST-level file skipping: only data
        files whose zone map for ``col`` overlaps [lo, hi] are handed
        to the scan.  Files without stats for ``col`` are kept
        (conservative — skipping may only remove provably-irrelevant
        files).  Returns (df, n_files_total, n_files_read).

        This is planning-time pruning from manifest metadata alone —
        at 100 TB it turns "list + open a million footers" into one
        manifest read, and is exactly how Delta/Iceberg serve
        SELECT ... WHERE key BETWEEN without touching cold files.
        Callers still apply the real predicate: the zone map is a
        superset filter, never the filter itself."""
        return self.read_pruned_all({col: (lo, hi)}, version=version)

    def read_pruned_all(
        self, preds: dict[str, tuple], version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Multi-predicate file skipping: a file is kept only if its
        zone map overlaps EVERY (col, [lo, hi]) range — the AND
        semantics of a conjunctive predicate.  With a Z-ordered write
        layout (q_zorder_layout) each file is tight in several
        dimensions at once, so multi-column pruning multiplies the
        skip rate instead of being dominated by one sort column."""
        v = self.latest_version() if version is None else version
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        kept = []
        for f in manifest["files"]:
            fstats = stats.get(f, {})
            keep = True
            for col, (lo, hi) in preds.items():
                zm = fstats.get(col)
                if zm is not None and not (zm[0] <= hi and zm[1] >= lo):
                    keep = False
                    break
            if keep:
                kept.append(f)
        if not kept:  # empty overlap: preserve schema with a 0-row scan
            df = self.read(v).limit(0)
        else:
            df = self.spark.read.parquet(
                *[os.path.join(self.data_dir, f) for f in kept]
            )
        return df, len(manifest["files"]), len(kept)
