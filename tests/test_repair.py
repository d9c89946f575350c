"""impute_group_mean / iqr_outliers unit semantics."""

import pytest

from hpaste_spark.operators.repair import impute_group_mean, iqr_outliers


def test_impute_fills_with_group_mean_not_global(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    out = impute_group_mean(df, "v", "g").collect()
    filled = {(r.g, r.v) for r in out if r.v_imputed}
    assert filled == {("a", 2.0), ("b", 10.0)}, "group mean, never global"
    assert sum(r.v_imputed for r in out) == 2
    assert all(r.v is not None for r in out)


def test_impute_all_null_group_stays_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("c", None), ("c", None)], "g string, v double"
    )
    rows = impute_group_mean(df, "v", "g").collect()
    cs = [r for r in rows if r.g == "c"]
    assert all(r.v is None and r.v_imputed for r in cs), \
        "no global fallback: an all-null group must stay null"


def test_iqr_outliers_flags_both_tails(spark):
    # 1..100 plus two extreme points
    rows = [("g", float(i)) for i in range(1, 101)] + [("g", -1000.0), ("g", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = iqr_outliers(df, "v", "g", k=1.5).collect()
    got = {(r.value, r.side) for r in out}
    assert (-1000.0, "low") in got and (1000.0, "high") in got
    assert len(out) == 2, "interior points must not be flagged"
    with pytest.raises(ValueError):
        iqr_outliers(df, "v", "g", k=-1)
