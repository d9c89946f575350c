"""Bucketed range (interval) join — point events matched to time
intervals on the same key.

The reference's MR layer would express this as another secondary-sort
job (partition by key, sort by time, sweep a window through the reduce
stream — mapreduce/mapreduce2.scala:1087-1108).  Naive Spark is worse:
``left.join(right, key AND ts BETWEEN start AND end)`` plans the range
predicate as a post-join filter on the key-only equi-join, producing
|points_per_key| × |intervals_per_key| intermediate rows per key —
quadratic in per-key history, fatal at 100 TB (and with no equi-key at
all it degrades to BroadcastNestedLoopJoin).

The scale path used here is the classic bucketed rewrite: quantize
time into fixed-width buckets, explode each interval into the buckets
it covers, and equi-join on (key…, bucket) — a plain hash join whose
fan-out is bounded by interval_width / bucket_width.  The exact
BETWEEN predicate then filters within the matched bucket.  Each point
falls in exactly ONE bucket and an interval's covered-bucket list is
distinct, so no dedup pass is needed — the rewrite is exact, not
approximate.

Pick ``bucket_us`` near the typical interval length: too small
explodes intervals into many buckets; too large packs unrelated rows
into one bucket and pushes work back into the post-join filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hpaste_spark.functions.timeutil import epoch_us as _us

_BKT = "__rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join left point rows (``ts_col``) to right interval rows
    (``start_col`` <= ts <= ``end_col``, inclusive both ends) sharing
    the ``on`` key columns.  ``how`` is ``inner`` or ``left`` (left
    keeps unmatched points with null interval columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    on = list(on)

    lb = left.withColumn(_BKT, F.floor(_us(F.col(ts_col)) / F.lit(bucket_us)))
    rb = right.withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(_us(F.col(start_col)) / F.lit(bucket_us)),
                F.floor(_us(F.col(end_col)) / F.lit(bucket_us)),
            )
        ),
    )
    within = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        return lb.join(rb, on + [_BKT], "inner").filter(within).drop(_BKT)
    # left-outer: inner core + anti-joined leftovers with nulls.  The
    # BETWEEN filter must run inside the core before the union (a
    # left join + filter would drop unmatched rows entirely).  The
    # anti-join condition is null-safe so left rows carrying nulls
    # don't reappear as phantom leftovers after matching.
    core = lb.join(rb, on + [_BKT], "inner").filter(within).drop(_BKT)
    la, ca = left.alias("__rj_l"), core.select(*left.columns).alias("__rj_c")
    cond = None
    for c in left.columns:
        eq = F.col(f"__rj_l.{c}").eqNullSafe(F.col(f"__rj_c.{c}"))
        cond = eq if cond is None else (cond & eq)
    leftovers = la.join(ca, cond, "left_anti")
    for c in core.columns:
        if c not in left.columns:
            leftovers = leftovers.withColumn(c, F.lit(None).cast(core.schema[c].dataType))
    return core.unionByName(leftovers.select(*core.columns))
