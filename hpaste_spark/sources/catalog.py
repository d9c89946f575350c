"""Catalog over the driver-generated parquet fixtures (TESTDATA.md).

Maps the reference's MR input surface — HTableInput / HTableQuery
(mapreduce2.scala:466-554), HPathInput (:559-568), HSequenceInput
(:642-653) — onto ``spark.read``: every table input is just a lazy
DataFrame; filters/column selection push into the parquet scan via
Catalyst, which is exactly what the reference did by stuffing its Scan
object into the job conf (mapreduce2.scala:546).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # The fixture encoding of events.ts has changed across driver rounds:
    #   round 1: parquet TIMESTAMP(NANOS) — read as long under the
    #            nanosAsLong legacy conf, converted here with *integer*
    #            division (a double round-trip would lose low bits at
    #            ~1.7e18 ns), matching DuckDB's truncating nanos→micros;
    #   round 2+: parquet timestamp[us] isAdjustedToUTC=false — Spark
    #            reads TIMESTAMP_NTZ.  Normalize to TIMESTAMP: the
    #            session TZ is pinned UTC (session.py), so the cast is a
    #            pure type change with identical values, and everything
    #            downstream (unix_micros, window ranges, DuckDB parity)
    #            sees one canonical timestamp type.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_events_between(
    spark: SparkSession, sf_dir: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """Time-range scan over events with the predicate pushed to the scan.

    A filter on the *converted* ts column (``timestamp_micros(ts div
    1000)``) is opaque to parquet pushdown — at 100 TB that is a full
    scan.  Instead translate the [start, end) bound to the raw nanosecond
    long BEFORE conversion: ``trunc(ns/1000) >= s_us  ⟺  ns >= s_us*1000``
    (floor division is monotone), so the rewrite is exact and the scan
    prunes row groups on min/max stats — the Spark analog of the
    reference's server-side time-range (Query2.scala:493-495, :899-901).
    """
    import datetime as _dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = next(f.dataType for f in df.schema.fields if f.name == "ts")

    def _us(s: str) -> int:
        t = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        return int(t.timestamp() * 1_000_000)

    if isinstance(ts_type, T.LongType):
        if start is not None:
            df = df.filter(F.col("ts") >= _us(start) * 1000)
        if end is not None:
            df = df.filter(F.col("ts") < _us(end) * 1000)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Filter on the NTZ column with an NTZ literal so the predicate
        # stays a plain column-vs-literal comparison the parquet scan can
        # prune on (casting the COLUMN first would defeat pushdown);
        # normalize the type only after the filter.
        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(start).cast("timestamp_ntz"))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(end).cast("timestamp_ntz"))
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(start).cast("timestamp"))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(end).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = DRIVER_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_text(spark: SparkSession, *paths: str) -> DataFrame:
    """HPathInput equivalent (mapreduce2.scala:559-568)."""
    return spark.read.text(list(paths))
