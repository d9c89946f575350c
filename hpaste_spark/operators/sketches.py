"""Mergeable sketches: distinct counts (Apache DataSketches HLL via
Spark's hll_* functions) and frequencies (Count-Min).

The 100 TB cardinality pattern: exact COUNT(DISTINCT) re-shuffles the
raw keys for every new grouping, but an HLL sketch is a MERGEABLE
partial — build per-partition/per-group sketches ONCE (one scan),
store the binary sketch column next to the rollup, and answer any
coarser grouping by unioning sketches, never rescanning the facts.
This is the HBase-counter philosophy (increment partials, merge on
read — IncrementOp.scala) applied to distinct counts.  Count-Min
(:func:`cms_counts`) is the same move for FREQUENCIES: a fixed
depth×width counter table that shards build independently and add
cell-wise.

Oracles: HLL encodings are engine-specific, so its registry query is
a rows-only check (like a5_approx_count_distinct) with pytest
asserting estimates against exact counts.  Count-Min uses the
deterministic md5 probe family, so its query IS hash-oracled —
DuckDB rebuilds the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALL = "ALL"


def hll_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """(group, approx_distinct) per group PLUS an ``'ALL'`` row whose
    estimate comes from UNIONING the per-group sketches — one scan of
    the data, the total never touches the raw values again.  ``lg_k``
    = log2 of the sketch size (12 → 4 KiB, ~2% relative error).
    Estimates are rounded to whole longs."""
    sk = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("_sk")
    )
    per_group = sk.select(
        "grp",
        F.round(F.hll_sketch_estimate("_sk")).cast("long").alias("approx_distinct"),
    )
    total = sk.agg(F.hll_union_agg("_sk").alias("_u")).select(
        F.lit(_ALL).alias("grp"),
        F.round(F.hll_sketch_estimate("_u")).cast("long").alias("approx_distinct"),
    )
    return per_group.unionAll(total)


def _cms_bucket(val_col, d_col, width: int):
    """Row-d bucket of a Count-Min sketch: 52-bit md5 prefix of
    "<value>:<d>" mod width — the same deterministic probe family as
    the Bloom filter (dedup._bloom_bit), so the DuckDB oracle replays
    the sketch bit-for-bit."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", val_col.cast("string"), d_col.cast("string")
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_counts(
    values: DataFrame, val_col: str = "v", depth: int = 3, width: int = 1024
) -> DataFrame:
    """The counter table of a Count-Min sketch (Cormode & Muthukrishnan
    2005) over a value column: depth rows × width buckets, each value
    occurrence incrementing one bucket per row — at most depth·width
    ROWS no matter how many values went in (the Bloom-bits posture for
    FREQUENCIES instead of membership).

    Mergeable by construction: counters from disjoint corpus shards
    add cell-wise, so at 100 TB each ingest batch ships a fixed-size
    partial and the union is one tiny aggregate — frequency telemetry
    without ever re-shuffling raw values.  Estimates via
    :func:`cms_estimate` are one-sided: min over rows ≥ true count,
    never under (collisions only inflate)."""
    ds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    return (
        values.select(F.col(val_col), ds)
        .select("d", _cms_bucket(F.col(val_col), F.col("d"), width).alias("b"))
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    val_col: str = "v",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-Min point estimates for the DISTINCT values of ``probes``:
    expand each probe to its depth buckets, broadcast-join the
    (≤ depth·width-row) counter table, and take the MIN counter per
    value — (value, cms_n).  A bucket with no counter row means count
    0 (possible when probing values the sketch never saw).  The probe
    side is never shuffled at corpus size — only the per-value min
    aggregation moves matched rows."""
    ds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    p = (
        probes.select(F.col(val_col)).distinct()
        .select(F.col(val_col), ds)
        .select(
            F.col(val_col), "d", _cms_bucket(F.col(val_col), F.col("d"), width).alias("b")
        )
    )
    return (
        p.join(F.broadcast(cms), ["d", "b"], "left")
        .groupBy(val_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_n"))
    )
