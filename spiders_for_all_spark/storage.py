"""Snapshot-table storage: Iceberg-style semantics over plain Parquet.

Per SURVEY §7.0 the engine targets an Iceberg catalog (MERGE INTO, snapshot
time-travel, per-round checkpoint commits).  The sandbox image has no Iceberg
runtime jar, so the catalog is abstracted behind this module with the same
shape a real Iceberg catalog has:

  * every table snapshot is a **manifest** (``snap-NNNNNN.json``) listing the
    immutable parquet data directories that make up the table at that version
    (Iceberg: manifest lists / data files);
  * an **append** commit writes only the new rows and a manifest that is
    ``previous files + one new dir`` — O(new rows) I/O per commit, never a
    rewrite of history (Iceberg: fast append);
  * a **merge** commit on a bucketed table rewrites only the buckets the
    source rows touch (Iceberg: MERGE INTO with bucket(key) partition spec,
    copy-on-write at file granularity);
  * the current snapshot of *all* tables lives in one ``_CATALOG.json``
    flipped by a single ``os.replace`` — a multi-table round commit is
    therefore **atomic**: a crash mid-round leaves every table at the
    previous round (Iceberg: single-catalog transaction).

Resume = re-read the catalog; time-travel = read any earlier manifest.
A production deployment swaps :class:`SnapshotStorage` for an Iceberg
catalog with identical call sites (``commit`` -> snapshot overwrite,
``commit_append`` -> fast append, ``merge_upsert`` -> ``MERGE INTO t USING s
ON t.k = s.k WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *``,
``commit_multi`` -> one transaction).

The reference's equivalents: DDL-on-init (core/spider.py:113-120),
truncate-insert (core/spider.py:196-210), SQLite upsert
(core/spider.py:218-236).  Unlike the reference, a killed run here loses
nothing: all loop state is in committed snapshots (§3.4).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spiders_for_all_spark import schemas as S

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "frontier": S.FRONTIER,
    "seen": S.SEEN,
    "documents": S.DOCUMENTS,
    "fetch_log": S.FETCH_LOG,
    "robots": S.ROBOTS,
    "host_budget": S.HOST_BUDGET,
}

MERGE_BUCKETS = 64  # bucket(key) partition spec for merge tables


class Staged:
    """A staged (not yet visible) snapshot: data written, manifest pending."""

    __slots__ = ("table", "snap", "manifest")

    def __init__(self, table: str, snap: int, manifest: dict):
        self.table = table
        self.snap = snap
        self.manifest = manifest


class SnapshotStorage:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _data_dir(self, table: str, snap: int, rel: bool = False) -> str:
        d = f"data-{snap:06d}"
        return d if rel else os.path.join(self._table_dir(table), d)

    def _manifest_path(self, table: str, snap: int) -> str:
        return os.path.join(self._table_dir(table), f"snap-{snap:06d}.json")

    def _catalog_path(self) -> str:
        return os.path.join(self.warehouse, "_CATALOG.json")

    # -- catalog (the single atomically-flipped pointer) --------------------
    def _read_catalog(self) -> dict[str, int]:
        try:
            with open(self._catalog_path()) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _write_catalog(self, catalog: dict[str, int]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.warehouse)
        with os.fdopen(fd, "w") as fh:
            json.dump(catalog, fh)
        os.replace(tmp, self._catalog_path())

    # -- snapshot metadata ---------------------------------------------------
    def latest_snapshot(self, table: str) -> int | None:
        return self._read_catalog().get(table)

    def snapshots(self, table: str) -> list[int]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n.split("-")[1].split(".")[0])
            for n in os.listdir(d)
            if n.startswith("snap-") and n.endswith(".json")
        )

    def _load_manifest(self, table: str, snap: int) -> dict:
        with open(self._manifest_path(table, snap)) as fh:
            return json.load(fh)

    def _manifest_dirs(self, table: str, manifest: dict) -> list[str]:
        base = self._table_dir(table)
        if "buckets" in manifest:
            rels = list(manifest["buckets"].values())
        else:
            rels = manifest["files"]
        return [os.path.join(base, r) for r in rels]

    # -- read ------------------------------------------------------------
    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        snap = self.latest_snapshot(table) if snapshot is None else snapshot
        if snap is None:
            return self.empty(table)
        dirs = self._manifest_dirs(table, self._load_manifest(table, snap))
        if not dirs:
            return self.empty(table)
        return self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(*dirs)

    def empty(self, table: str) -> DataFrame:
        return self.spark.createDataFrame([], TABLE_SCHEMAS[table])

    def data_files(self, table: str, snapshot: int | None = None) -> list[str]:
        """Parquet data dirs backing a snapshot (for O(new-rows) assertions)."""
        snap = self.latest_snapshot(table) if snapshot is None else snapshot
        if snap is None:
            return []
        return self._manifest_dirs(table, self._load_manifest(table, snap))

    # -- staging (write data + manifest file; catalog not yet flipped) -------
    def _next_snap(self, table: str) -> int:
        snaps = self.snapshots(table)
        return (snaps[-1] + 1) if snaps else 0

    def _stage_manifest(self, table: str, snap: int, manifest: dict) -> Staged:
        os.makedirs(self._table_dir(table), exist_ok=True)
        with open(self._manifest_path(table, snap), "w") as fh:
            json.dump(manifest, fh)
        return Staged(table, snap, manifest)

    def stage_overwrite(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> Staged:
        """Full-table snapshot (K1 truncate-insert / bootstrap / frontier flip)."""
        snap = self._next_snap(table)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._data_dir(table, snap))
        return self._stage_manifest(
            table, snap, {"files": [self._data_dir(table, snap, rel=True)]}
        )

    def stage_append(self, table: str, df: DataFrame) -> Staged:
        """Fast append: write ONLY df's rows; manifest = previous + new dir.

        O(new rows) I/O per commit — the fix for the per-round full-table
        rewrite scale-killer (a crawl of R rounds writes R deltas, never
        re-copies history).
        """
        prev = self.latest_snapshot(table)
        prev_files = (
            self._load_manifest(table, prev).get("files", []) if prev is not None else []
        )
        snap = self._next_snap(table)
        df.write.mode("overwrite").parquet(self._data_dir(table, snap))
        files = prev_files + [self._data_dir(table, snap, rel=True)]
        return self._stage_manifest(table, snap, {"files": files})

    def stage_merge(
        self,
        table: str,
        source: DataFrame,
        key: str | list[str],
        n_buckets: int = MERGE_BUCKETS,
        keep_on_match: list[str] | None = None,
    ) -> Staged:
        """MERGE INTO with bucket(key) copy-on-write: rewrite touched buckets only.

        The table is laid out as one parquet dir per ``pmod(xxhash64(key),
        n_buckets)`` bucket.  Source rows are bucketed the same way; only the
        buckets that receive source rows are read + rewritten — at 10^10 docs
        a round that touches k buckets costs O(k/n_buckets of the table), not
        a full copy (VERDICT r01 item 4/9).  Source must be key-unique
        (caller dedups, matching the reference's unique-constraint
        semantics — core/spider.py:218-236).

        ``keep_on_match``: columns whose TARGET value survives an update
        (``WHEN MATCHED THEN UPDATE SET * EXCEPT (...)``) — e.g. ``create_at``
        keeps its first-insert value while ``update_at`` is refreshed
        (reference: database/schema.py:23-29 onupdate semantics).
        """
        keys = [key] if isinstance(key, str) else list(key)
        bucket_expr = F.pmod(
            F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
        ).cast("int")

        prev = self.latest_snapshot(table)
        prev_manifest = self._load_manifest(table, prev) if prev is not None else {}
        base = self._table_dir(table)
        snap = self._next_snap(table)
        out_dir = self._data_dir(table, snap)
        out_rel = self._data_dir(table, snap, rel=True)

        source = source.withColumn("_bucket", bucket_expr)
        touched = sorted(
            r["_bucket"] for r in source.select("_bucket").distinct().collect()
        )

        if "buckets" in prev_manifest:
            old_buckets: dict[str, str] = dict(prev_manifest["buckets"])
            touched_dirs = [
                os.path.join(base, old_buckets[str(b)])
                for b in touched
                if str(b) in old_buckets
            ]
            target = (
                self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(*touched_dirs)
                if touched_dirs
                else self.empty(table)
            )
        else:
            # legacy / bootstrap layout: treat every file as touched once,
            # converting the table to the bucketed layout in this commit
            old_buckets = {}
            target = self.read(table, prev) if prev is not None else self.empty(table)
            touched = None  # rewrite everything

        src = source.drop("_bucket")
        if keep_on_match:
            kept = target.select(
                *keys, *[F.col(c).alias(f"_t_{c}") for c in keep_on_match]
            )
            src = src.join(kept, on=keys, how="left")
            for c in keep_on_match:
                src = src.withColumn(
                    c, F.coalesce(F.col(f"_t_{c}"), F.col(c))
                ).drop(f"_t_{c}")
            src = src.select(*[f.name for f in source.drop("_bucket").schema.fields])
        merged = (
            target.join(src, on=keys, how="left_anti")
            .unionByName(src, allowMissingColumns=True)
            .withColumn("_bucket", bucket_expr)
        )
        # co-locate each bucket in one task before the dynamic-partition
        # write: without this every shuffle task writes a sliver of every
        # bucket dir (tasks x buckets small files — measured 85 s/round at
        # 50k urls; ~2 s after)
        merged = merged.repartition(n_buckets, "_bucket")
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)

        written = {
            d.split("=")[1]: f"{out_rel}/{d}"
            for d in os.listdir(out_dir)
            if d.startswith("_bucket=")
        }
        buckets = dict(old_buckets)
        buckets.update(written)
        return self._stage_manifest(table, snap, {"buckets": buckets})

    # -- commits ------------------------------------------------------------
    def commit_multi(self, staged: list[Staged]) -> None:
        """Atomically make a set of staged snapshots current (one os.replace).

        The engine stages documents/seen/fetch_log/frontier for a round and
        flips them together: a crash between stage and flip leaves ALL tables
        at the previous round — no partial round is ever visible (the
        zero-loss resume guarantee).
        """
        catalog = self._read_catalog()
        for s in staged:
            catalog[s.table] = s.snap
        self._write_catalog(catalog)

    def commit(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Stage a full-table snapshot and flip the catalog."""
        staged = self.stage_overwrite(table, df, partition_by)
        self.commit_multi([staged])
        return staged.snap

    def commit_append(self, table: str, df: DataFrame) -> int:
        staged = self.stage_append(table, df)
        self.commit_multi([staged])
        return staged.snap

    # -- MERGE INTO emulation (K2) -------------------------------------------
    def merge_upsert(
        self,
        table: str,
        source: DataFrame,
        key: str | list[str],
        n_buckets: int = MERGE_BUCKETS,
        keep_on_match: list[str] | None = None,
    ) -> int:
        staged = self.stage_merge(table, source, key, n_buckets, keep_on_match)
        self.commit_multi([staged])
        return staged.snap

    def truncate_insert(self, table: str, df: DataFrame) -> int:
        """K1: DELETE FROM t + insert == overwrite snapshot."""
        return self.commit(table, df)

    # -- maintenance ----------------------------------------------------------
    def compact(self, table: str, partition_by: list[str] | None = None) -> int:
        """Rewrite the table as one data dir (Iceberg rewrite_data_files).

        Append-only tables accumulate one dir per round; compaction folds
        them back to a single columnar-friendly dir.  Run it every ~64
        rounds (the engine does this automatically) so manifest length and
        small-file count stay bounded on long crawls.
        """
        current = self.read(table)
        return self.commit(table, current, partition_by)

    def n_data_dirs(self, table: str) -> int:
        snap = self.latest_snapshot(table)
        if snap is None:
            return 0
        return len(self._manifest_dirs(table, self._load_manifest(table, snap)))

    def vacuum(self, table: str) -> list[int]:
        """Drop staged-but-never-committed snapshots (crash orphans).

        A crash between stage and catalog flip leaves manifests/data dirs
        newer than the catalog pointer; they are invisible to reads and this
        removes them (Iceberg: expire_snapshots on orphaned metadata).
        """
        import shutil

        current = self.latest_snapshot(table)
        if current is None:
            return []
        dropped = []
        for snap in self.snapshots(table):
            if snap > current:
                os.remove(self._manifest_path(table, snap))
                d = self._data_dir(table, snap)
                if os.path.isdir(d):
                    shutil.rmtree(d)
                dropped.append(snap)
        return dropped
