"""Z-order (Morton-curve) data layout — multi-dimensional min/max
pruning paid at write time.

Sorting a table by ONE column gives parquet row-group/file pruning on
that column and nothing on any other; real scan patterns filter on two
or three (customer AND date, key AND time).  Interleaving the bits of
per-column quantile ranks and sorting by the interleaved key clusters
rows so every FILE covers a narrow value range on EVERY z-ordered
column at once — a selective conjunctive filter then skips most files
from footer statistics alone, the Delta/Iceberg ``OPTIMIZE ZORDER``
posture.  Like `sources/bucketed.py` and the reference's pre-split
regions (HBaseTestingUtility.createTable splits, mapreduce2.scala:546
locality), the philosophy is: pay layout once at write time, every
query inherits the pruning for free.

Scale shape of the write job: one ``approxQuantile`` pass per z column
to learn bucket boundaries (driver-collected — 2^bits_per_dim doubles
per column, a write-once cost by design, exactly like
``similarity.build_ivf_index``), then a narrow per-row bucket+interleave
expression, a range-repartition on the z-key (one shuffle — sampled
range boundaries keep output files equal-sized even under skew), and a
within-partition sort.  Reads need nothing special: plain parquet scan;
pruning comes from footer min/max of the NATIVE columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(col: Column, boundaries: "list[float]") -> Column:
    """Quantile-rank bucket in [0, len(boundaries)]: the count of
    learned boundaries <= value, folded over a literal array (baked
    into the plan — no join, no window; nulls sink to bucket 0)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0),
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_dim: int = 6,
    rel_err: float = 0.001,
) -> Column:
    """The Morton key column for ``cols``: each column is mapped to its
    ``2^bits_per_dim``-quantile rank (equi-DEPTH buckets — skewed data
    still spreads across the full bucket range, where equi-width
    buckets would collapse), and rank bits are interleaved
    round-robin.  Learns boundaries with one ``approxQuantile`` action
    per call — a write-job cost, not a query cost."""
    n_buckets = 1 << bits_per_dim
    qs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        bounds = df.selectExpr(f"CAST({c} AS DOUBLE) AS _z").approxQuantile(
            "_z", qs, rel_err
        )
        # dedup plateaus: repeated boundaries would double-count in the
        # ">= fold" and skip bucket ids
        uniq = sorted(set(bounds))
        buckets.append(_bucket_of(F.col(c), uniq))
    z = F.lit(0).cast("long")
    for bit in range(bits_per_dim - 1, -1, -1):
        for b in buckets:
            z = F.shiftleft(z, 1) + F.shiftright(b.cast("long"), bit).bitwiseAND(1)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits_per_dim: int = 6,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``cols``: range-repartition on the z-key (equal-sized output files
    under any skew) + sort within partitions, so each file's footer
    min/max is tight on EVERY z-ordered column."""
    z = zorder_key(df, cols, bits_per_dim)
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
