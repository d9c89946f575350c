"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same logical plans that pass correctness at
sf=0.01 keep working at cluster scale:

- AQE on (runtime join re-planning, skew-join splitting, partition
  coalescing) — replaces the reference's hand-set reducer counts
  (mapreduce2.scala:140 ReducerCountConf).
- shuffle.partitions defaults to the local core count; on a real
  cluster this is overridden (AQE coalesces anyway).
- Arrow enabled so any Pandas-UDF path is batch-columnar.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hpaste-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r13 (guide §3.1/§9): let the planner pick shuffled-hash join
        # when its size conditions hold instead of always sort-merge —
        # drops the per-side sorts; A/B over the 10 most SMJ-heavy
        # registry queries measured 28.7 s → 24.6 s with identical
        # results (strategy only).  The AQE threshold (= one advisory
        # partition) bounds the build side a runtime SMJ→SHJ rewrite
        # may hash, so a mis-estimated build partition can't OOM.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "134217728",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/hpaste-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply our runtime-settable defaults to an externally-created
    session (e.g. the driver's).  Static confs (driver memory) are left
    alone."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # r13: shuffled-hash join when it fits (see get_spark)
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
        # driver fixtures store events.ts as TIMESTAMP(NANOS); read as long
        # and convert (see sources/catalog.load_table)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
