"""resample_gapfill / rolling_range_agg / pivot_counts / numeric_corr
unit semantics on hand-built rows."""

import datetime as dt

import pytest
from pyspark.sql import Row

from hpaste_spark.operators.groups import pivot_counts
from hpaste_spark.operators.profile import numeric_corr
from hpaste_spark.operators.timeseries import resample_gapfill, rolling_range_agg

T0 = dt.datetime(2024, 1, 1)  # midnight: aligned to every bucket grid


def _ev(minutes, value, uid=1):
    return Row(user_id=uid, ts=T0 + dt.timedelta(minutes=minutes), value=float(value))


def test_resample_fills_interior_gaps(spark):
    # events in buckets 0 and 2 (15-min grid); bucket 1 must appear empty
    df = spark.createDataFrame([_ev(1, 10.0), _ev(2, 5.0), _ev(31, 7.0)])
    out = resample_gapfill(df, bucket_minutes=15).orderBy("bucket_start_us").collect()
    assert len(out) == 3, "spine must cover min..max inclusive"
    assert [r.n_events for r in out] == [2, 0, 1]
    assert out[0].sum_value == 15.0
    assert out[1].sum_value is None, "empty bucket sums to NULL, not 0"
    assert out[2].sum_value == 7.0
    # absolute epoch grid: starts are multiples of the bucket width
    assert all(r.bucket_start_us % (15 * 60 * 1_000_000) == 0 for r in out)


def test_rolling_range_trailing_window(spark):
    # user 1: events at 0, 30, 90 min; 60-min trailing window
    df = spark.createDataFrame(
        [_ev(0, 1.0), _ev(30, 2.0), _ev(90, 4.0), _ev(10, 8.0, uid=2)]
    )
    out = {
        (r.user_id, r.ts_us): (r.rolling_n, r.rolling_sum)
        for r in rolling_range_agg(df, window_minutes=60).collect()
    }
    us = 60 * 1_000_000
    e = lambda m: int((T0 - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000 + m * us
    assert out[(1, e(0))] == (1, 1.0)
    assert out[(1, e(30))] == (2, 3.0)  # 0 and 30 both inside [−60, 30]
    assert out[(1, e(90))] == (2, 6.0)  # 30 and 90; 0 fell out
    assert out[(2, e(10))] == (1, 8.0)  # partitions are independent


def test_pivot_counts_explicit_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "zz")],
        "k long, v string",
    )
    out = {r.k: (r.a, r.b) for r in pivot_counts(df, "k", "v", ["a", "b"]).collect()}
    assert out == {1: (2, 1), 2: (0, 1)}  # missing cell -> 0; 'zz' dropped
    with pytest.raises(ValueError):
        pivot_counts(df, "k", "v", [])


def test_numeric_corr_exact_signs(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)],
        "x double, y double, z double",
    )
    out = {(r.col_x, r.col_y): r.corr for r in numeric_corr(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    with pytest.raises(ValueError):
        numeric_corr(df, ["x"])


def test_pivot_sum_variant(spark):
    from hpaste_spark.operators.groups import pivot_counts

    df = spark.createDataFrame(
        [(1, "a", 2.0), (1, "a", 3.0), (1, "b", 1.0), (2, "a", 7.0)],
        "k long, v string, x double",
    )
    out = {r.k: (r.a, r.b) for r in pivot_counts(df, "k", "v", ["a", "b"], agg_col="x").collect()}
    assert out[1] == (5.0, 1.0)
    assert out[2] == (7.0, None), "sum of an absent cell is NULL, not 0"


def test_decay_weighted_mean_halflife(spark):
    """Two events 24h apart with half-life 24h: the older carries half
    the weight -> mean = (0.5*old + 1*new) / 1.5."""
    import pytest

    from hpaste_spark.operators.timeseries import decay_weighted_mean

    df = spark.createDataFrame(
        [_ev(0, 6.0), _ev(24 * 60, 12.0), _ev(24 * 60, 100.0, uid=2)]
    )
    out = {r.user_id: r for r in decay_weighted_mean(df, 24.0).collect()}
    assert out[1].decayed_mean == round((0.5 * 6.0 + 1.0 * 12.0) / 1.5, 6)
    assert out[1].decayed_weight == 1.5
    assert out[2].decayed_mean == 100.0  # single event at the snapshot
    with pytest.raises(ValueError):
        decay_weighted_mean(df, 0)
