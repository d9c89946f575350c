"""Z-order layout: per-file footer min/max must be tight on EVERY
z-ordered column — that is the whole point (multi-dim pruning), and
what a single-column sort cannot give."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hpaste_spark.sources.catalog import load_table
from hpaste_spark.sources.layout import zorder_write

SF = "/root/testdata/sf0.001"
DIMS = ("o_custkey", "o_totalprice")


def _avg_widths(path):
    """Mean per-file (max-min)/global_range for each dim."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) > 4, "need enough files for a meaningful layout"
    stats = {d: [] for d in DIMS}
    glo = {d: [None, None] for d in DIMS}
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.row_group(0).column(i).path_in_schema: i
                 for i in range(meta.num_columns)}
        for d in DIMS:
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(names[d]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            fmin, fmax = min(mins), max(maxs)
            stats[d].append((fmin, fmax))
            glo[d][0] = fmin if glo[d][0] is None else min(glo[d][0], fmin)
            glo[d][1] = fmax if glo[d][1] is None else max(glo[d][1], fmax)
    out = {}
    for d in DIMS:
        rng = float(glo[d][1] - glo[d][0]) or 1.0
        out[d] = sum(float(mx - mn) for mn, mx in stats[d]) / len(stats[d]) / rng
    return out


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


def test_zorder_files_tight_on_both_dims(spark, orders, tmp_path_factory):
    zdir = str(tmp_path_factory.mktemp("layout") / "z")
    ldir = str(tmp_path_factory.mktemp("layout") / "linear")
    zorder_write(orders, zdir, DIMS, n_files=16, bits_per_dim=6)
    # baseline: classic single-column sort layout
    (orders.repartitionByRange(16, "o_custkey")
           .sortWithinPartitions("o_custkey").write.mode("overwrite").parquet(ldir))
    zw, lw = _avg_widths(zdir), _avg_widths(ldir)
    # z-order: BOTH dims tight
    assert zw["o_custkey"] < 0.5, zw
    assert zw["o_totalprice"] < 0.5, zw
    # linear: first dim tight, second dim ~full-width per file
    assert lw["o_custkey"] < 0.2, lw
    assert lw["o_totalprice"] > 0.8, lw
    # and the z layout beats linear on the second dim by a wide margin
    assert zw["o_totalprice"] < lw["o_totalprice"] / 2


def test_zorder_roundtrip_and_pushdown(spark, orders, tmp_path):
    zdir = str(tmp_path / "z")
    zorder_write(orders, zdir, DIMS, n_files=8, bits_per_dim=4)
    back = spark.read.parquet(zdir)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # double sums are summation-order-dependent; compare at cent precision
    agg_a = orders.agg(F.round(F.sum("o_totalprice"), 2), F.sum("o_orderkey")).collect()
    agg_b = back.agg(F.round(F.sum("o_totalprice"), 2), F.sum("o_orderkey")).collect()
    assert agg_a == agg_b
    plan = back.filter(
        (F.col("o_custkey") < 100) & (F.col("o_totalprice") > 50000)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:200]
