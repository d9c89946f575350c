"""Time-series reshaping: fixed-interval resampling with gap-fill and
range-frame rolling aggregates.

The reference's time dimension stops at per-cell timestamps and
time-range scan predicates (Query2.scala betweenTimestamps); these are
the two shapes every metrics/observability pipeline layers on top:
"events per 15-minute bucket, INCLUDING the empty buckets" and "per
user, how many events in the trailing hour at each event".

Scale shape (resample): the bucket aggregation is one map-side-combined
hash-agg keyed by the bucket index.  The dense bucket spine comes from
ONE broadcast min/max row expanded with ``sequence``/``explode`` — the
spine is |range|/interval rows (clock time, not data volume: a year of
15-minute buckets is 35k rows) and joins broadcast against the
aggregate, so gap-filling never shuffles the fact table a second time.

Scale shape (rolling): a RANGE-framed window over (partition, epoch) —
Spark evaluates it with one sort per partition inside the window
exchange; state is the frame's sliding buffer, never the whole
partition.  The frame bound is on the numeric epoch, so out-of-order
timestamps need no pre-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpaste_spark.functions.timeutil import epoch_us

_US_PER_MIN = 60 * 1_000_000


def resample_gapfill(
    events: DataFrame,
    bucket_minutes: int = 15,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(bucket_start_us, n_events, sum_value) for EVERY bucket between
    the corpus min and max timestamp — empty buckets present with
    n_events = 0 and sum_value NULL (SQL SUM-of-nothing semantics, so
    a gap is distinguishable from a bucket of zero-valued events).
    ``bucket_start_us`` is the bucket's epoch-microsecond start, an
    absolute grid (epoch // interval) identical on any engine."""
    if bucket_minutes <= 0:
        raise ValueError("bucket_minutes must be positive")
    us = int(bucket_minutes) * _US_PER_MIN
    ev = events.select(
        (F.floor(epoch_us(F.col(ts_col)) / F.lit(us)).cast("long")).alias("_b"),
        F.col(value_col).alias("_v"),
    )
    agg = ev.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("_v"), 2).alias("sum_value"),
    )
    spine = (
        ev.agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(F.explode(F.sequence("_lo", "_hi")).alias("_b"))
    )
    return (
        spine.join(agg, "_b", "left")
        .select(
            (F.col("_b") * us).alias("bucket_start_us"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "sum_value",
        )
    )


def rolling_range_agg(
    events: DataFrame,
    window_minutes: int = 60,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-row trailing-window aggregate: for every event, the count
    and sum of the SAME partition's events in the closed interval
    [t - window, t] — the "requests in the last hour" shape.  The
    frame is RANGE-based on epoch microseconds, so ties share a frame
    and irregular sampling needs no bucketing.  Returns the input keys
    plus (rolling_n, rolling_sum)."""
    if window_minutes <= 0:
        raise ValueError("window_minutes must be positive")
    us = int(window_minutes) * _US_PER_MIN
    ev = events.select(
        F.col(partition_col),
        F.col(ts_col),
        F.col(value_col),
        epoch_us(F.col(ts_col)).alias("_e"),
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy("_e")
        .rangeBetween(-us, 0)
    )
    return ev.select(
        partition_col,
        F.col("_e").alias("ts_us"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_n"),
        F.round(F.sum(value_col).over(w), 2).alias("rolling_sum"),
    )


def decay_weighted_mean(
    events: DataFrame,
    half_life_hours: float = 24.0,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(group, n_events, decayed_mean, decayed_weight) — exponentially
    time-decayed mean of ``value_col`` per group as of the CORPUS max
    timestamp: weight = 2^(−Δt/half_life).  The recency-weighted user
    score every ranking/personalization pipeline keeps.

    The recursive EWMA is rewritten in its closed snapshot form
    Σ w_i·v_i / Σ w_i, so it is ONE map-side-combined hash-agg over a
    narrow projection — no window, no ordering, no per-group state.
    The snapshot time rides in as a broadcast one-row max.  Rounded to
    6 dp (weights are smooth exponentials; last-ulp pow() differences
    sit ~8 orders below the rounding grain)."""
    if half_life_hours <= 0:
        raise ValueError("half_life_hours must be positive")
    us_per_hour = 3_600 * 1_000_000
    ev = events.select(
        F.col(group_col),
        epoch_us(F.col(ts_col)).alias("_e"),
        F.col(value_col).alias("_v"),
    )
    snap = ev.agg(F.max("_e").alias("_t"))
    w = F.pow(
        F.lit(2.0),
        -((F.col("_t") - F.col("_e")) / F.lit(us_per_hour)) / F.lit(half_life_hours),
    )
    return (
        ev.crossJoin(F.broadcast(snap))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(w * F.col("_v")) / F.sum(w), 6).alias("decayed_mean"),
            F.round(F.sum(w), 6).alias("decayed_weight"),
        )
    )
