"""Snapshot-table storage: Iceberg-style semantics over plain Parquet.

Per SURVEY §7.0 the engine targets an Iceberg catalog (MERGE INTO, snapshot
time-travel, per-round checkpoint commits).  The sandbox image has no Iceberg
runtime jar, so the catalog is abstracted behind this module: every commit
writes an immutable ``snap-NNNNNN`` parquet directory and atomically flips a
``_LATEST`` pointer file (write-temp + os.replace).  Resume = re-read the
latest pointer; time-travel = read any earlier snapshot.  A production
deployment swaps :class:`SnapshotStorage` for an Iceberg catalog with
identical call sites (``commit`` -> snapshot append, ``merge_upsert`` ->
``MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE * WHEN NOT
MATCHED THEN INSERT *``).

The reference's equivalents: DDL-on-init (core/spider.py:113-120),
truncate-insert (core/spider.py:196-210), SQLite upsert
(core/spider.py:218-236).  Unlike the reference, a killed run here loses
nothing: all loop state is in committed snapshots (§3.4).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
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


class SnapshotStorage:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _snap_dir(self, table: str, snapshot: int) -> str:
        return os.path.join(self._table_dir(table), f"snap-{snapshot:06d}")

    def _pointer(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_LATEST")

    # -- snapshot metadata -------------------------------------------------
    def latest_snapshot(self, table: str) -> int | None:
        try:
            with open(self._pointer(table)) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def snapshots(self, table: str) -> list[int]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n.split("-")[1]) for n in os.listdir(d) if n.startswith("snap-")
        )

    # -- read / write -------------------------------------------------------
    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        snap = self.latest_snapshot(table) if snapshot is None else snapshot
        if snap is None:
            return self.empty(table)
        return self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(
            self._snap_dir(table, snap)
        )

    def empty(self, table: str) -> DataFrame:
        return self.spark.createDataFrame([], TABLE_SCHEMAS[table])

    def commit(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Write df as the next immutable snapshot and flip _LATEST atomically.

        ``partition_by`` physically partitions the snapshot (e.g. ``seen`` by
        ``bucket`` so the anti-join / bloom probe reads co-partitioned data —
        the storage-partitioned-join layout of PLANS.md; with an Iceberg
        catalog this is the table's bucket partition spec instead).
        """
        prev = self.latest_snapshot(table)
        snap = 0 if prev is None else prev + 1
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._snap_dir(table, snap))
        os.makedirs(self._table_dir(table), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._table_dir(table))
        with os.fdopen(fd, "w") as fh:
            fh.write(str(snap))
        os.replace(tmp, self._pointer(table))
        return snap

    # -- MERGE INTO emulation (K2) -------------------------------------------
    def merge_upsert(self, table: str, source: DataFrame, key: str | list[str]) -> int:
        """``MERGE INTO table USING source ON key WHEN MATCHED UPDATE * WHEN
        NOT MATCHED INSERT *`` — the Spark-native form of the reference's
        SQLite ``ON CONFLICT DO UPDATE`` (core/spider.py:218-236).

        Expressed as target-anti-join-source ∪ source: one shuffle on the
        key, no driver-side rows.  Source must be key-unique (caller dedups,
        matching the reference's unique-constraint semantics).
        """
        keys = [key] if isinstance(key, str) else list(key)
        target = self.read(table)
        merged = target.join(source, on=keys, how="left_anti").unionByName(source)
        return self.commit(table, merged)

    def truncate_insert(self, table: str, df: DataFrame) -> int:
        """K1: DELETE FROM t + insert == overwrite snapshot."""
        return self.commit(table, df)
