"""As-of join (operators/asof.py) — the reference could only express
this as a hand-written secondary-sort MR job
(mapreduce/mapreduce2.scala:1087-1108); ours is the union+window
streaming merge.  Covers what the DuckDB-oracle query can't: forward
direction, tolerance bounds, duplicate right timestamps, no-match
left rows.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from hpaste_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), "L1"),
            ("u1", _ts("2024-01-01 12:00:00"), "L2"),
            ("u2", _ts("2024-01-01 09:00:00"), "L3"),  # before any right row
            ("u3", _ts("2024-01-01 09:00:00"), "L4"),  # key with no right rows
        ],
        "user_id string, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), "R1"),
            ("u1", _ts("2024-01-01 10:00:00"), "R2"),  # ties L1 exactly
            ("u1", _ts("2024-01-01 11:00:00"), "R3"),
            ("u2", _ts("2024-01-01 09:30:00"), "R4"),
        ],
        "user_id string, ts timestamp, val string",
    )
    return left, right


def _by_label(rows):
    return {r["lbl"]: r for r in rows}


def test_backward_inclusive_and_outer(frames):
    left, right = frames
    out = _by_label(
        asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["val"]).collect()
    )
    assert len(out) == 4  # every left row survives (left-outer)
    assert out["L1"]["val_right"] == "R2"  # equal ts matches (inclusive)
    assert out["L2"]["val_right"] == "R3"  # latest at-or-before
    assert out["L3"]["val_right"] is None  # right rows all later
    assert out["L4"]["val_right"] is None  # key absent from right
    assert out["L4"]["ts_right"] is None


def test_forward_direction(frames):
    left, right = frames
    out = _by_label(
        asof_join(
            left, right, on=["user_id"], ts_col="ts", payload_cols=["val"], direction="forward"
        ).collect()
    )
    assert out["L1"]["val_right"] == "R2"  # equal ts still matches
    assert out["L2"]["val_right"] is None  # nothing at-or-after 12:00
    assert out["L3"]["val_right"] == "R4"  # earliest at-or-after


def test_tolerance_nulls_payload_keeps_row(frames):
    left, right = frames
    out = _by_label(
        asof_join(
            left,
            right,
            on=["user_id"],
            ts_col="ts",
            payload_cols=["val"],
            tolerance_us=30 * 60 * 1_000_000,  # 30 minutes
        ).collect()
    )
    assert len(out) == 4
    assert out["L1"]["val_right"] == "R2"  # gap 0 <= 30m
    # L2's nearest match R3 is 60 min old → outside tolerance → nulled
    assert out["L2"]["val_right"] is None and out["L2"]["ts_right"] is None


def test_tolerance_exact_bounds(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), "L")], "k string, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 09:00:00"), "R")], "k string, ts timestamp, val string"
    )
    hour_us = 3600 * 1_000_000
    ok = asof_join(
        left, right, on=["k"], ts_col="ts", payload_cols=["val"], tolerance_us=hour_us
    ).collect()[0]
    assert ok["val_right"] == "R"  # gap == tolerance is inclusive
    cut = asof_join(
        left, right, on=["k"], ts_col="ts", payload_cols=["val"], tolerance_us=hour_us - 1
    ).collect()[0]
    assert cut["val_right"] is None and cut["ts_right"] is None
    assert cut["lbl"] == "L"  # row still emitted


def test_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), "L")], "k string, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 09:00:00"), "Ra"),
            ("k", _ts("2024-01-01 09:00:00"), "Rz"),
        ],
        "k string, ts timestamp, val string",
    )
    for _ in range(3):
        out = asof_join(
            left, right, on=["k"], ts_col="ts", payload_cols=["val"]
        ).collect()
        assert out[0]["val_right"] == "Rz"  # max payload struct wins, every run


def test_multi_column_key_and_plan(frames):
    """Composite key works and the physical plan is ONE exchange on the
    key — no nested-loop / cartesian anywhere."""
    left, right = frames
    l2 = left.withColumn("region", F.lit("us"))
    r2 = right.withColumn("region", F.lit("us"))
    j = asof_join(l2, r2, on=["user_id", "region"], ts_col="ts", payload_cols=["val"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union inputs coalesce to one shuffle
    out = _by_label(j.collect())
    assert out["L2"]["val_right"] == "R3"
