"""Group-fold operators — the reference's UDAF/secondary-sort surface.

Reference: HReducer group folds (X2, mapreduce2.scala:1037-1071),
HGroupingTask secondary sort (W1, :1087-1108), GroupByRow (A2,
:844-875).  Spark-first rule: use built-in aggregates whenever the fold
is expressible; drop to Arrow-batched ``applyInPandas`` only for
genuinely opaque per-group code — and even then the shuffle is one
``groupBy``, identical to the built-in path.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_apply(df: DataFrame, keys: list[str], fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """A2/X2: opaque per-group fold via applyInPandas (GROUPED_MAP).
    ``fn`` receives the whole group as a pandas DataFrame."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def group_apply_sorted(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """W1 secondary sort + opaque fold: the group arrives sorted by
    ``order_by`` (the reference's sortComparator) — sorting happens
    inside the group (pandas), not as an extra exchange."""

    def sorted_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(order_by, kind="mergesort"))

    return df.groupBy(*keys).applyInPandas(sorted_fn, schema=schema)


def zscore_normalize(df: DataFrame, keys: list[str], value_col: str, id_col: str) -> DataFrame:
    """Per-group z-score normalization through the applyInPandas path —
    the canonical 'opaque group fold' demonstration (population stddev;
    ddof=0 matches SQL STDDEV_POP).  Single-member groups and zero
    variance normalize to 0.

    NOTE: z-score is fully EXPRESSIBLE — this Arrow round-trip exists
    only to exercise the X2 opaque-fold extension point (the reference's
    HReducer shape).  For production use :func:`zscore_normalize_native`:
    same output, pure window expressions, whole-stage codegen, no
    Python workers.  Copy THIS form only for folds built-in aggregates
    genuinely cannot express."""
    dtypes = dict(df.dtypes)
    out_schema = (
        f"{id_col} {dtypes[id_col]}, "
        + ", ".join(f"{k} {dtypes[k]}" for k in keys)
        + ", zscore double"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive in shuffle order; sort by the unique id so the
        # pandas mean/std fp fold is identical across runs
        pdf = pdf.sort_values(id_col, kind="mergesort")
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        out = pdf[[id_col, *keys]].copy()
        out["zscore"] = z
        return out

    return df.groupBy(*keys).applyInPandas(norm, schema=out_schema)


def zscore_normalize_native(
    df: DataFrame, keys: list[str], value_col: str, id_col: str
) -> DataFrame:
    """The expressible twin of :func:`zscore_normalize`: one window
    exchange on ``keys``, AVG/STDDEV_POP over the unbounded frame, and
    a guarded division — all JVM-side, whole-stage-codegen'd, no Arrow
    transfer and no Python workers.  Identical semantics (ddof=0;
    single-member / zero-variance groups → 0.0); prefer this whenever
    the fold is expressible — the applyInPandas form is the X2
    extension-point demonstrator, not the fast path."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    m = F.avg(value_col).over(w)
    sd = F.stddev_pop(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - m) / sd).otherwise(F.lit(0.0))
    return df.select(id_col, *keys, z.alias("zscore"))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same user exceeds the gap.  Built-in
    window functions (lag + running sum) — one exchange on user_col.

    ``tiebreak_cols`` makes the window order TOTAL: rows sharing
    ``(user_col, ts_col)`` would otherwise receive lag/running-sum in
    partition-arrival order, flipping ``session_idx`` between runs.
    Pass a unique key (e.g. ``["event_id"]``) for deterministic output.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, *(tiebreak_cols or []))
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_minutes * 60)
    ).cast("int")
    session_idx = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("session_idx", session_idx)


# NOTE: the former salted_sum lived here with a monotonically_increasing_id
# salt; it is superseded by operators.skew.salted_groupby, whose
# deterministic xxhash64 salt keeps results bit-stable across runs.


def pivot_counts(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: "list[str]",
    agg_col: "str | None" = None,
) -> DataFrame:
    """Wide one-row-per-key pivot: count (or sum of ``agg_col``) of
    rows per (key, pivot-value), one output column per value in
    ``values``.  The value list is EXPLICIT — Spark's two-pass
    ``pivot()`` without values runs a distinct-collect job over the
    pivot column first, a full extra scan at 100 TB; with the list
    supplied the pivot is a single map-side-combined hash-agg, exactly
    a conditional-aggregation GROUP BY.  Unlisted pivot values are
    dropped (standard PIVOT IN (...) semantics); missing cells are 0
    for counts, NULL for sums."""
    if not values:
        raise ValueError("pivot_counts needs an explicit value list")
    g = df.groupBy(key_col).pivot(pivot_col, values)
    if agg_col is None:
        out = g.count()
        return out.select(
            key_col,
            *[F.coalesce(F.col(v), F.lit(0)).cast("long").alias(v) for v in values],
        )
    return g.sum(agg_col)
