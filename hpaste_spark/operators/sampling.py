"""Deterministic sampling / dataset-split operators (north star).

Training-data pipelines need splits that are (a) reproducible across
runs and engines, (b) stable under repartitioning, and (c) computable
without any global state — so everything here keys off a content hash
of the row id, never off rand() or row position.

The hash is the first 4 hex chars of md5(id-as-string) → int:
cross-engine reproducible (DuckDB: ('0x'||substr(md5(x),1,4))::BIGINT),
uniform enough for percentage splits, and cheap (one JVM md5 per row,
no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 65536  # 16 bits of the md5


def hash_bucket(col, buckets: int = 100):
    """Deterministic bucket in [0, buckets) from md5 of the value."""
    h = F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 4), 16, 10).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame, id_col: str, holdout_pct: int = 5, split_col: str = "split"
) -> DataFrame:
    """Tag each row 'train' / 'holdout' by id hash — an ~holdout_pct%
    holdout that is stable across runs, engines, and partitionings."""
    return df.withColumn(
        split_col,
        F.when(hash_bucket(F.col(id_col), 100) < holdout_pct, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def stratified_take(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic n rows per group: rank by (id-hash, id) within the
    group and keep the first n.  One exchange on the group key; the
    hash ordering makes the choice uniform-ish and reproducible (a
    rand()-based sample is neither)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), HASH_BUCKETS), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )
