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
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION_FILE = "_VERSION"


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the next-version claim (or published it
    first).  The losing batch FAILS — it is never silently clobbered."""


class ParquetStorage:
    """Storage for one logical table: versioned parquet snapshots.

    ``partition_prefix_len=N`` additionally hash-organizes each snapshot
    into key-prefix partition directories (``_kp=<first N chars of
    rowkey>``) — the Spark analog of HBase's key-ranged regions.  Point
    gets and rowkey-range scans then prune whole directories
    (PartitionFilters), not just row groups; at 100 TB that is the
    difference between listing a handful of files and listing the
    table.  The ``_kp`` column is derived on write and stripped on
    read, so the logical schema never sees it."""

    def __init__(
        self,
        base_dir: str,
        name: str,
        partition_prefix_len: int | None = None,
        keep_versions: int = 2,
        claim_ttl_s: float = 600.0,
    ):
        self.table_dir = os.path.join(base_dir, name)
        self.name = name
        self.partition_prefix_len = partition_prefix_len
        # snapshot retention applied after every write (time-travel
        # horizon); raise for longer history, vacuum_versions() to trim
        self.keep_versions = max(1, keep_versions)
        # a claim older than this is treated as a crashed writer's
        # leftover and may be broken by the next writer
        self.claim_ttl_s = claim_ttl_s

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
        # an empty partitionBy() write leaves a fileless dir that cannot
        # be schema-inferred on read — the initial snapshot is unpartitioned
        self.write(empty, partition=False)

    def drop(self) -> None:
        if os.path.exists(self.table_dir):
            shutil.rmtree(self.table_dir)

    # -- IO ---------------------------------------------------------------
    def versions(self) -> list[int]:
        """All snapshot versions still on disk, ascending."""
        if not os.path.isdir(self.table_dir):
            return []
        out = []
        for d in os.listdir(self.table_dir):
            if d.startswith("v="):
                out.append(int(d[2:]))
        return sorted(out)

    def vacuum_versions(self, keep_last: int | None = None) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (the current
        one is always kept; default = ``keep_versions``).  Returns the
        versions removed.  Safe with hardlinked partial-rewrite
        snapshots: removing an old snapshot dir unlinks its names; any
        file shared into a surviving snapshot keeps its inode alive."""
        if keep_last is None:
            keep_last = self.keep_versions
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self.current_version()
        removed = []
        for v in self.versions():
            if v != cur and v <= cur - keep_last:
                shutil.rmtree(self.snapshot_dir(v), ignore_errors=True)
                removed.append(v)
        return removed

    def read(
        self,
        spark: SparkSession,
        schema=None,
        key_prefixes: list[str] | None = None,
        key_prefix_range: tuple[str | None, str | None] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot — or, with ``version=N``, time
        travel to any snapshot still on disk (snapshots are immutable
        once published, so an old version is a consistent table state).
        ``key_prefixes`` / ``key_prefix_range`` constrain the ``_kp``
        partition column BEFORE it is stripped, so the listing prunes
        directories."""
        if not self.exists():
            if schema is None:
                raise FileNotFoundError(f"table {self.name} does not exist")
            return spark.createDataFrame([], schema)
        if version is None:
            version = self.current_version()
        elif not os.path.isdir(self.snapshot_dir(version)):
            raise FileNotFoundError(
                f"table {self.name} has no snapshot v={version} "
                f"(available: {self.versions()})"
            )
        df = spark.read.parquet(self.snapshot_dir(version))
        if "_kp" in df.columns:
            if key_prefixes is not None:
                df = df.filter(F.col("_kp").isin([*key_prefixes]))
            if key_prefix_range is not None:
                lo, hi = key_prefix_range
                if lo is not None:
                    df = df.filter(F.col("_kp") >= lo)
                if hi is not None:
                    # prefix truncation makes the upper bound inclusive
                    df = df.filter(F.col("_kp") <= hi)
            df = df.drop("_kp")
        return df

    # -- commit protocol --------------------------------------------------
    # Two concurrent batches (MultiTableBatch from two drivers, or a
    # streaming foreachBatch beside a batch job) would both compute
    # new_version = current+1 and the second publish would silently
    # clobber the first.  The claim file (O_EXCL create) serializes
    # writers BEFORE any data is written, and the publish re-checks the
    # base version — the loser raises ConcurrentWriteError instead of
    # losing its batch.

    def _claim_path(self, version: int) -> str:
        return os.path.join(self.table_dir, f"v={version:06d}.claim")

    def _claim(self, new_version: int) -> str:
        os.makedirs(self.table_dir, exist_ok=True)
        path = self._claim_path(new_version)
        for attempt in (0, 1):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"pid={os.getpid()} t={time.time()}".encode())
                os.close(fd)
                return path
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(path)
                except FileNotFoundError:
                    continue  # holder just released; retry the O_EXCL create
                if attempt == 0 and age > self.claim_ttl_s:
                    # crashed writer's leftover: break it and retry once
                    try:
                        os.unlink(path)
                    except FileNotFoundError:
                        pass
                    continue
                raise ConcurrentWriteError(
                    f"table {self.name}: version {new_version} is claimed by a "
                    f"concurrent writer (claim age {age:.0f}s); this batch was NOT applied"
                )
        raise ConcurrentWriteError(f"table {self.name}: could not claim version {new_version}")

    def _publish(self, base_version: int, new_version: int, claim_path: str) -> None:
        try:
            cur = self.current_version()
            if cur != base_version:
                raise ConcurrentWriteError(
                    f"table {self.name}: version moved {base_version}->{cur} during "
                    f"the write; this batch was NOT applied"
                )
            tmp = self._version_path() + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(str(new_version))
            os.replace(tmp, self._version_path())  # atomic publish
        except Exception:
            shutil.rmtree(self.snapshot_dir(new_version), ignore_errors=True)
            raise
        finally:
            try:
                os.unlink(claim_path)
            except FileNotFoundError:
                pass

    def write(
        self,
        df: DataFrame,
        sort_by_rowkey: bool = True,
        partition: bool = True,
        marker_file: "tuple[str, str] | None" = None,
    ) -> int:
        """Write a new snapshot and atomically publish it. Returns version.
        Raises ConcurrentWriteError (batch not applied) if another writer
        holds the next version — never a silent lost update.

        ``marker_file=(name, content)`` writes a sidecar file into the
        snapshot directory BEFORE the version pointer flips, so the
        marker and the data become visible in the same atomic publish —
        the primitive an exactly-once ``foreachBatch`` sink needs
        (record the applied streaming batch id WITH the batch's effect;
        a crash either loses both, and the batch replays, or keeps
        both, and the replay is skipped — never a double-apply).  The
        name must start with ``_`` so Spark's parquet reader ignores
        it; read it back with :meth:`snapshot_marker`.

        Markers are STICKY (round-12 ADVICE fix): every publish carries
        FORWARD the base snapshot's marker sidecars it does not itself
        rewrite.  Without this, any foreign writer publishing between a
        stream batch's commit and a crash-replay (e.g. a bulk_merge_put
        whose merge carries the batch's counter effect forward) would
        erase the marker while preserving the effect — and the replayed
        batch would double-apply.  The carried marker is conservative
        in the other direction: a foreign DESTRUCTIVE overwrite that
        discards current data still carries the marker, so a replay is
        suppressed even though the effect is gone — re-applying onto
        post-overwrite data would be wrong anyway; restart the stream
        with a fresh checkpoint after destructive rewrites (documented
        in stream_increments_into)."""
        if marker_file is not None and not marker_file[0].startswith("_"):
            raise ValueError(
                "marker_file name must start with '_' (Spark readers skip "
                f"underscore-prefixed files): {marker_file[0]!r}"
            )
        base_version = self.current_version()
        new_version = base_version + 1
        claim = self._claim(new_version)
        try:
            out = self.snapshot_dir(new_version)
            if sort_by_rowkey and "rowkey" in df.columns:
                # Range-partitioned sort → globally key-ordered files, so
                # rowkey-range scans prune via parquet min/max, mirroring
                # HBase's sorted-region start/stop-row scans.
                df = df.sortWithinPartitions(F.col("rowkey"))
            writer = df.write.mode("overwrite")
            if partition and self.partition_prefix_len and "rowkey" in df.columns:
                df = df.drop("_kp").withColumn(
                    "_kp", F.substring(F.col("rowkey").cast("string"), 1, self.partition_prefix_len)
                )
                writer = df.write.mode("overwrite").partitionBy("_kp")
            writer.parquet(out)
            if marker_file is not None:
                with open(os.path.join(out, marker_file[0]), "w") as fh:
                    fh.write(marker_file[1])
            self._carry_markers(base_version, out, marker_file)
        except Exception:
            try:
                os.unlink(claim)
            except FileNotFoundError:
                pass
            raise
        self._publish(base_version, new_version, claim)
        self.vacuum_versions()
        return new_version

    def _carry_markers(
        self,
        base_version: int,
        out: str,
        marker_file: "tuple[str, str] | None" = None,
    ) -> None:
        """Copy the base snapshot's marker sidecars (underscore-prefixed
        files other than ``_SUCCESS``) into the new snapshot directory,
        skipping any name this publish wrote itself — the sticky-marker
        rule (see :meth:`write`).  Runs before the version-pointer flip,
        so markers and data stay atomic."""
        if base_version < 1:
            return
        prev = self.snapshot_dir(base_version)
        own = marker_file[0] if marker_file is not None else None
        try:
            entries = os.listdir(prev)
        except FileNotFoundError:
            return
        for name in entries:
            if not name.startswith("_") or name == "_SUCCESS" or name == own:
                continue
            src = os.path.join(prev, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(out, name))

    def snapshot_marker(self, name: str, version: int | None = None) -> "str | None":
        """Content of a :meth:`write` ``marker_file`` sidecar in the
        current (or given) snapshot, or None when absent.  Markers are
        STICKY: every publish (full write and partial rewrite) carries
        the previous snapshot's markers forward unless it rewrites the
        same name — so a marker answers "has batch ≤ last been applied
        to this table's lineage", which survives interleaved foreign
        merge-writes (whose merge carries the batch's EFFECT forward
        too).  Only deleting the table (or a snapshot GC past the
        marker's origin, which cannot happen — the current snapshot
        always carries it) clears markers."""
        if not self.exists():
            return None
        if version is None:
            version = self.current_version()
        try:
            with open(os.path.join(self.snapshot_dir(version), name)) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def supports_partial_rewrite(self) -> bool:
        """True when the CURRENT snapshot is prefix-partitioned, so a
        mutation batch can rewrite only its touched partitions."""
        if not (self.partition_prefix_len and self.exists()):
            return False
        cur = self.snapshot_dir(self.current_version())
        try:
            return any(e.startswith("_kp=") for e in os.listdir(cur))
        except FileNotFoundError:
            return False

    def write_partial(self, df: DataFrame, touched_prefixes: list[str]) -> int:
        """Commit a snapshot that rewrites ONLY the touched key-prefix
        partitions; every other partition directory is hardlinked from
        the previous snapshot (O(files) metadata work, no data copied —
        the snapshot-manifest trick of production table formats).  At
        100 TB this makes a point-put cost ∝ its partition, not the
        table.  GC stays safe: removing an old snapshot just unlinks,
        the shared inodes survive."""
        assert self.supports_partial_rewrite()
        touched = {f"_kp={p}" for p in touched_prefixes}
        base_version = self.current_version()
        new_version = base_version + 1
        claim = self._claim(new_version)
        try:
            prev = self.snapshot_dir(base_version)
            out = self.snapshot_dir(new_version)
            os.makedirs(out, exist_ok=True)
            for entry in os.listdir(prev):
                if entry.startswith("_kp=") and entry not in touched:
                    src = os.path.join(prev, entry)
                    dst = os.path.join(out, entry)
                    os.makedirs(dst, exist_ok=True)
                    for f in os.listdir(src):
                        os.link(os.path.join(src, f), os.path.join(dst, f))
            if "rowkey" in df.columns:
                df = df.sortWithinPartitions(F.col("rowkey"))
            df = df.drop("_kp").withColumn(
                "_kp", F.substring(F.col("rowkey").cast("string"), 1, self.partition_prefix_len)
            )
            df.write.mode("append").partitionBy("_kp").parquet(out)
            self._carry_markers(base_version, out)
        except Exception:
            shutil.rmtree(self.snapshot_dir(new_version), ignore_errors=True)
            try:
                os.unlink(claim)
            except FileNotFoundError:
                pass
            raise
        self._publish(base_version, new_version, claim)
        self.vacuum_versions()
        return new_version

