"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's hll_* functions).

The 100 TB cardinality pattern: exact COUNT(DISTINCT) re-shuffles the
raw keys for every new grouping, but an HLL sketch is a MERGEABLE
partial — build per-partition/per-group sketches ONCE (one scan),
store the binary sketch column next to the rollup, and answer any
coarser grouping by unioning sketches, never rescanning the facts.
This is the HBase-counter philosophy (increment partials, merge on
read — IncrementOp.scala) applied to distinct counts.

No DuckDB oracle: sketch encodings are engine-specific, so the
registry query is a rows-only check (like a5_approx_count_distinct);
the pytest asserts the estimates against exact counts instead.
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
