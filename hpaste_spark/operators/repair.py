"""Data-repair operators: per-group null imputation and IQR outlier
fencing — the "fix the column before the aggregate lies about it"
stage of a pipeline.

Both follow the repo's windowless profiling posture: the per-group
statistics (mean / quartiles) come from ONE hash-aggregate whose
result is broadcast-joined back onto the scan — the fact table is
never windowed, never self-joined, never sorted.  The group-stats side
is |groups| rows; at 100 TB that broadcast is what you want as long as
the group column is a real dimension (type, source, label), which is
the use case — per-ROW groups would make imputation meaningless
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_group_mean(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: "str | None" = None,
    ndigits: int = 6,
) -> DataFrame:
    """Fill NULLs in ``value_col`` with the group's non-null mean
    (rounded to ``ndigits`` so both engines agree bit-for-bit), and
    add ``<out_col>_imputed`` marking the filled rows.  A group whose
    values are ALL null stays null (flag stays true) — inventing a
    global fallback silently mixes distributions; callers who want one
    can coalesce again.  One agg + one broadcast join."""
    out = out_col or value_col
    means = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.round(F.avg(value_col), ndigits).alias("_gm")
    )
    return (
        df.join(F.broadcast(means), df[group_col] == F.col("_g"), "left")
        .withColumn(f"{out}_imputed", F.col(value_col).isNull())
        .withColumn(out, F.coalesce(F.col(value_col), F.col("_gm")))
        .drop("_g", "_gm")
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Rows outside the per-group Tukey fences
    ``[q1 − k·IQR, q3 + k·IQR]`` — (group, value, lo_fence, hi_fence,
    side).  Quartiles are exact interpolated percentiles from one
    aggregate pass (rounded to 6 dp before the fence arithmetic, so
    the fence comparison is engine-stable); ``side`` is 'low'/'high'.
    The outlier set is the FILTER output — callers anti-join it away
    or route it to quarantine."""
    if k < 0:
        raise ValueError("k must be non-negative")
    q = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.round(F.percentile(F.col(value_col), F.lit(0.25)), 6).alias("_q1"),
        F.round(F.percentile(F.col(value_col), F.lit(0.75)), 6).alias("_q3"),
    )
    lo = F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))
    v = F.col(value_col)
    return (
        df.join(F.broadcast(q), df[group_col] == F.col("_g"))
        .withColumn("lo_fence", F.round(lo, 6))
        .withColumn("hi_fence", F.round(hi, 6))
        .filter((v < F.col("lo_fence")) | (v > F.col("hi_fence")))
        .select(
            group_col,
            v.alias("value"),
            "lo_fence",
            "hi_fence",
            F.when(v < F.col("lo_fence"), F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("side"),
        )
    )
