"""Versioned Parquet table storage — the engine's write-side substrate.

The reference writes through HBase (GravityTableOutputFormat.java:50-215,
WAL off, autoFlush off).  Our durability unit is an atomic snapshot
swap: each mutation batch writes a brand-new snapshot directory
``<table>/v=N`` and then atomically repoints the ``_VERSION`` file.
Readers always read the version named by ``_VERSION``, so a reader never
observes a half-written table and a writer never overwrites the
directory a concurrent reader (or its own merge plan) is scanning —
Spark cannot safely ``mode=overwrite`` a path that feeds the same plan,
and at 100 TB a read-modify-write must never be driver-materialized.

Scale posture: snapshots are plain parquet dirs (zstd), optionally
sorted by ``rowkey`` so min/max row-group stats give the same
start/stop-row pruning HBase got from its sorted regions
(Query2.scala:903-908).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION_FILE = "_VERSION"


class ParquetStorage:
    """Storage for one logical table: versioned parquet snapshots."""

    def __init__(self, base_dir: str, name: str):
        self.table_dir = os.path.join(base_dir, name)
        self.name = name

    # -- snapshot bookkeeping -------------------------------------------
    def _version_path(self) -> str:
        return os.path.join(self.table_dir, VERSION_FILE)

    def current_version(self) -> int:
        try:
            with open(self._version_path()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def snapshot_dir(self, version: int) -> str:
        return os.path.join(self.table_dir, f"v={version:06d}")

    def exists(self) -> bool:
        return os.path.exists(self._version_path())

    # -- lifecycle -------------------------------------------------------
    def create(self, spark: SparkSession, schema) -> None:
        """Initialize an empty table (reference: createScript DDL emission,
        HbaseTable.scala:234-243 — ours creates the directory for real)."""
        if self.exists():
            return
        empty = spark.createDataFrame([], schema)
        self.write(empty)

    def drop(self) -> None:
        if os.path.exists(self.table_dir):
            shutil.rmtree(self.table_dir)

    # -- IO ---------------------------------------------------------------
    def read(self, spark: SparkSession, schema=None) -> DataFrame:
        if not self.exists():
            if schema is None:
                raise FileNotFoundError(f"table {self.name} does not exist")
            return spark.createDataFrame([], schema)
        return spark.read.parquet(self.snapshot_dir(self.current_version()))

    def write(self, df: DataFrame, sort_by_rowkey: bool = True) -> int:
        """Write a new snapshot and atomically publish it. Returns version."""
        new_version = self.current_version() + 1
        out = self.snapshot_dir(new_version)
        if sort_by_rowkey and "rowkey" in df.columns:
            # Range-partitioned sort → globally key-ordered files, so
            # rowkey-range scans prune via parquet min/max, mirroring
            # HBase's sorted-region start/stop-row scans.
            df = df.sortWithinPartitions(F.col("rowkey"))
        df.write.mode("overwrite").parquet(out)
        tmp = self._version_path() + ".tmp"
        os.makedirs(self.table_dir, exist_ok=True)
        with open(tmp, "w") as fh:
            fh.write(str(new_version))
        os.replace(tmp, self._version_path())  # atomic publish
        self._gc(keep=2)
        return new_version

    def _gc(self, keep: int) -> None:
        """Drop snapshots older than the newest `keep`."""
        cur = self.current_version()
        for entry in os.listdir(self.table_dir):
            if entry.startswith("v="):
                v = int(entry.split("=")[1])
                if v <= cur - keep:
                    shutil.rmtree(os.path.join(self.table_dir, entry), ignore_errors=True)
