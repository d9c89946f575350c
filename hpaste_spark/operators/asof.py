"""Point-in-time (as-of) join — a time-series operator the reference's
MR layer could only express as a hand-written secondary-sort job
(HGroupingTask partitioner/sort/grouping comparators,
mapreduce/mapreduce2.scala:1087-1108: partition by key, sort by
timestamp, carry last-seen right value through the reduce stream).
Here it is one declarative shape, and the execution strategy is the
same streaming-merge idea Catalyst-native:

    union(left, right) → window(partitionBy key, orderBy ts) →
    last(right payload, ignorenulls) → keep left rows

Why not ``left.join(right, key AND r.ts <= l.ts)`` + argmax?  That is
a range join: Spark plans it as a broadcast nested loop or an exploded
equi-join on key alone, producing |left_per_key| × |right_per_key|
intermediate rows per key — quadratic in the per-key history length,
fatal at 100 TB.  The union+window form is ONE hash exchange on the
join key plus a partition-local sort; per-key cost is linear and
map-side input stays narrow (key, ts, payload struct).

Semantics (direction="backward", the ASOF JOIN default): for each left
row, the single right row with the greatest ``right.ts <= left.ts``
for the same key; ties at equal ts match (inclusive), right rows with
equal (key, ts) are resolved deterministically by max payload struct.  direction="forward" flips the inequality to the smallest
``right.ts >= left.ts``.  ``tolerance_us`` bounds the match age: a
matched right row farther than the tolerance is treated as no-match
(payload nulled), the left row is still emitted (left-outer shape).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpaste_spark.functions.timeutil import epoch_us

_SIDE = "__asof_side"
_PAY = "__asof_payload"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left-outer as-of join.  Returns every left row plus, for the
    nearest right row at-or-before (backward) / at-or-after (forward)
    its ``ts_col`` within the same ``on`` key: each payload column as
    ``<name><suffix>`` and the matched right timestamp as
    ``ts<suffix>`` (all null when no match / outside tolerance)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload_cols = list(payload_cols)

    # One struct per right row so every output column comes from the SAME
    # matched row (per-column last() would be allowed to disagree if the
    # right side ever carried duplicate (key, ts) pairs).
    pay = F.struct(
        F.col(ts_col).alias(_RTS), *[F.col(c) for c in payload_cols]
    )
    r = right.select(*on, F.col(ts_col).alias(ts_col), pay.alias(_PAY), F.lit(0).alias(_SIDE))
    left_cols = left.columns
    l = left.select(
        *left_cols, F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY), F.lit(1).alias(_SIDE)
    ).select(*left_cols, _PAY, _SIDE)
    # align: right side gets nulls for left-only columns
    for c in left_cols:
        if c not in on and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = r.select(*left_cols, _PAY, _SIDE).unionByName(l)

    # Backward: ascending ts; right (side=0) sorts before left at equal ts
    # so the match is inclusive (l.ts >= r.ts), matching ASOF JOIN.
    # Forward: descending ts; at equal ts right must STILL precede left in
    # frame order, and side 0 < 1 ascending does exactly that.
    # Trailing payload-struct order makes duplicate right (key, ts) rows
    # deterministic: last() then picks the max payload struct.
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col(_SIDE).asc(), F.col(_PAY).asc_nulls_first()]
    else:
        order = [F.col(ts_col).desc(), F.col(_SIDE).asc(), F.col(_PAY).asc_nulls_first()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)).filter(
        F.col(_SIDE) == 1
    )

    if tolerance_us is not None:
        gap = F.abs(epoch_us(F.col(ts_col)) - epoch_us(F.col(_PAY)[_RTS]))
        matched = matched.withColumn(
            _PAY, F.when(gap <= F.lit(tolerance_us), F.col(_PAY))
        )

    out = matched.select(
        *left_cols,
        F.col(_PAY)[_RTS].alias(f"ts{suffix}"),
        *[F.col(_PAY)[c].alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
