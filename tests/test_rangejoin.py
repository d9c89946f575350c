"""Bucketed range join (operators/rangejoin.py): exactness of the
bucket rewrite (boundary inclusivity, intervals spanning many
buckets), left-outer null-safety, and the hash-join plan shape."""

import datetime

import pytest
from pyspark.sql import functions as F

from hpaste_spark.operators.rangejoin import range_join

MIN_US = 60 * 1_000_000


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 10:00:00"), "P_start"),  # == w_start
            ("k1", _ts("2024-01-01 10:30:00"), "P_mid"),
            ("k1", _ts("2024-01-01 11:00:00"), "P_end"),  # == w_end
            ("k1", _ts("2024-01-01 11:00:01"), "P_after"),
            ("k2", _ts("2024-01-01 10:30:00"), "P_otherkey"),
        ],
        "k string, ts timestamp, lbl string",
    )
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "W1")],
        "k string, w_start timestamp, w_end timestamp, wlbl string",
    )
    return points, intervals


def test_inclusive_bounds_and_key_isolation(frames):
    points, intervals = frames
    out = range_join(
        points, intervals, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
        bucket_us=10 * MIN_US,
    )
    got = sorted(r["lbl"] for r in out.collect())
    assert got == ["P_end", "P_mid", "P_start"]  # both ends inclusive; k2/after excluded


def test_interval_spanning_many_buckets_no_duplicates(frames):
    points, intervals = frames
    # tiny bucket → the 1h interval explodes into 61 buckets; each point
    # must still match exactly once
    out = range_join(
        points, intervals, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
        bucket_us=MIN_US,
    )
    labels = [r["lbl"] for r in out.collect()]
    assert sorted(labels) == ["P_end", "P_mid", "P_start"]
    assert len(labels) == len(set(labels))


def test_left_outer_keeps_unmatched_points(frames):
    points, intervals = frames
    out = range_join(
        points, intervals, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
        bucket_us=10 * MIN_US, how="left",
    )
    rows = {r["lbl"]: r for r in out.collect()}
    assert len(rows) == 5
    assert rows["P_mid"]["wlbl"] == "W1"
    assert rows["P_after"]["wlbl"] is None and rows["P_after"]["w_start"] is None
    assert rows["P_otherkey"]["wlbl"] is None


def test_left_outer_null_key_rows_survive_once(spark):
    points = spark.createDataFrame(
        [(None, _ts("2024-01-01 10:30:00"), "P_nullkey")],
        "k string, ts timestamp, lbl string",
    )
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "W1")],
        "k string, w_start timestamp, w_end timestamp, wlbl string",
    )
    out = range_join(
        points, intervals, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
        bucket_us=10 * MIN_US, how="left",
    ).collect()
    assert len(out) == 1 and out[0]["wlbl"] is None


def test_plan_is_hash_join_not_nested_loop(frames):
    points, intervals = frames
    j = range_join(
        points, intervals, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
        bucket_us=10 * MIN_US,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_bad_args_rejected(frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        range_join(points, intervals, on=["k"], ts_col="ts",
                   start_col="w_start", end_col="w_end", how="full")
    with pytest.raises(ValueError):
        range_join(points, intervals, on=["k"], ts_col="ts",
                   start_col="w_start", end_col="w_end", bucket_us=0)
