"""Bucketed (pre-shuffled) tables — the co-located fact-to-fact join
path.

At 100 TB the expensive joins are fact-to-fact (lineitem ⨝ orders,
events ⨝ sessions): both sides shuffle on the key EVERY query.
Bucketing pays that shuffle once at write time — each table is stored
hash-partitioned into N buckets on the join key (optionally sorted
within buckets) — and every subsequent equi-join or aggregation on that
key reads co-located buckets with NO exchange in the plan: the scan
itself reports the hash partitioning and Catalyst drops both shuffles
(and with sorted buckets, both sorts) from the sort-merge join.

This is the Spark analog of the reference pre-splitting HBase regions
by key prefix for MR locality (HBaseTestingUtility.createTable splits,
mapreduce2.scala:546 table-input locality): layout decided at write
time, queries inherit it for free.

Caveat worth stating: bucket metadata lives in the session catalog
(`saveAsTable`); on a real deployment that is a persistent metastore,
and N buckets should be sized so one bucket ≈ one task's worth of data
(128–512 MB) at the target scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 32,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on
    ``bucket_cols`` (the one-time shuffle), sorted within buckets by
    ``sort_cols`` so merge joins need no per-query sort either."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec attached (the
    plain ``spark.table`` — named so call sites are explicit that the
    bucketing metadata, not a path scan, is what they want)."""
    return spark.table(table)
