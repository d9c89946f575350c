"""Group-fold operators: applyInPandas UDAF path (X2), secondary sort
(W1), sessionization."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from hpaste_spark.operators.groups import group_apply_sorted, sessionize, zscore_normalize

TS = dt.datetime


def test_group_apply_sorted_secondary_sort(spark):
    """W1: values arrive sorted within the group (HGroupingTask shape,
    mapreduce2.scala:1087-1108)."""
    df = spark.createDataFrame(
        [("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"), ("b", 2, "y2"), ("b", 1, "y1")],
        "g string, seq int, payload string",
    )

    def concat_in_order(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "joined": ["|".join(pdf["payload"])]})

    out = {
        r["g"]: r["joined"]
        for r in group_apply_sorted(df, ["g"], ["seq"], concat_in_order, "g string, joined string").collect()
    }
    assert out == {"a": "x1|x2|x3", "b": "y1|y2"}


def test_sessionize_gap_semantics(spark):
    base = TS(2024, 1, 1, 12, 0)
    rows = [
        (1, 10, base),
        (2, 10, base + dt.timedelta(minutes=10)),   # same session
        (3, 10, base + dt.timedelta(minutes=50)),   # gap 40min > 30 → new session
        (4, 20, base),                               # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_idx"] for r in sessionize(df, "user_id", "ts", 30).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_zscore_zero_variance_group(spark):
    df = spark.createDataFrame(
        [(1, 5, 10.0), (2, 5, 10.0), (3, 6, 1.0), (4, 6, 3.0)],
        "event_id long, user_id long, value double",
    )
    out = {r["event_id"]: r["zscore"] for r in zscore_normalize(df, ["user_id"], "value", "event_id").collect()}
    assert out[1] == 0.0 and out[2] == 0.0
    assert abs(out[3] + 1.0) < 1e-9 and abs(out[4] - 1.0) < 1e-9


def test_davg_integer_cents_path_empty_and_null_groups(spark):
    """The long-arithmetic davg must yield NULL (not an ANSI
    divide-by-zero error) for groups with zero non-null values, and
    match exact half-up rounding elsewhere."""
    from hpaste_spark.functions.money import davg

    df = spark.createDataFrame(
        [("a", 1.01), ("a", 2.02), ("b", None), ("c", 0.01)],
        "k string, v double",
    )
    rows = {r["k"]: r["avg_v"] for r in df.groupBy("k").agg(davg("v").alias("avg_v")).collect()}
    assert rows["a"] == 1.52  # (101 + 202) cents / 2 = 151.5 -> half-up 152
    assert rows["b"] is None, "all-null group must be NULL, not a div-by-zero"
    assert rows["c"] == 0.01


def test_davg_cent_sum_past_long_intermediate_headroom(spark):
    """A group whose cent sum exceeds ~4.6e14 must still average
    correctly: the pre-division 2*s*10^4 blowup runs in decimal(38,0),
    not long (where it would silently wrap with ANSI off)."""
    from hpaste_spark.functions.money import davg

    df = spark.createDataFrame(
        [("a", 2.0e12), ("a", 4.0e12)], "k string, v double"
    )  # cent sum 6e14 > 4.6e14 old headroom
    rows = {r["k"]: r["avg_v"] for r in df.groupBy("k").agg(davg("v").alias("avg_v")).collect()}
    assert rows["a"] == 3.0e12


def test_zscore_native_twin_matches_arrow_path_and_stays_jvm_side(spark):
    """zscore_normalize_native must (1) produce the same rounded output
    as the applyInPandas form and (2) contain NO Python-worker nodes in
    its physical plan — it is the copy-this-for-expressible-folds twin."""
    from pyspark.sql import functions as F

    from hpaste_spark.operators.groups import (zscore_normalize,
                                               zscore_normalize_native)

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 4.0),
         (4, "b", 5.0), (5, "c", 0.0), (6, "c", 0.0)],
        "event_id long, user_id string, value double",
    )
    arrow = {
        r["event_id"]: r["z"]
        for r in zscore_normalize(df, ["user_id"], "value", "event_id")
        .select("event_id", F.round("zscore", 9).alias("z")).collect()
    }
    native = {
        r["event_id"]: r["z"]
        for r in zscore_normalize_native(df, ["user_id"], "value", "event_id")
        .select("event_id", F.round("zscore", 9).alias("z")).collect()
    }
    assert native == arrow
    # singleton + zero-variance groups -> 0.0 in both
    assert native[4] == 0.0 and native[5] == 0.0
    plan = zscore_normalize_native(
        df, ["user_id"], "value", "event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
