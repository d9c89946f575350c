"""Skew-mitigation operators: salted plans must be bit-identical to the
plain plans, and the salt must actually fan a hot key out."""

import pytest
from pyspark.sql import functions as F

from hpaste_spark.operators.skew import salted_groupby, salted_join
from hpaste_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hot(spark):
    # one key carries 90% of the rows — the shape that serializes a reducer
    rows = [(1, "hot", float(i % 7)) for i in range(900)]
    rows += [(2, f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(
        [(i, k, v) for i, (_, k, v) in enumerate(rows)], "row_id long, k string, v double"
    )


def test_salted_groupby_equals_plain(spark, hot):
    salted = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in salted_groupby(
            hot, ["k"],
            {"s": ("sum", F.col("v")), "n": ("count", F.col("v")), "mx": ("max", F.col("v"))},
            salt_from="row_id", n_salts=8,
        ).collect()
    }
    plain = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in hot.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert salted == plain


def test_salt_actually_spreads_hot_key(spark, hot):
    """The hot key's rows must land on many distinct salts — a salt
    derived from the group key itself would collapse to 1 and silently
    restore the bottleneck."""
    n = (
        hot.filter(F.col("k") == "hot")
        .select(F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n == 8


def test_salted_groupby_rejects_non_mergeable(spark, hot):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_groupby(hot, ["k"], {"a": ("avg", F.col("v"))}, salt_from="row_id")


def test_salted_join_equals_plain_inner_and_left(spark, hot):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k3", "A"), ("missing", "Z")], "k string, tag string"
    )
    for how in ("inner", "left"):
        salted = sorted(
            (r["row_id"], r["tag"])
            for r in salted_join(
                hot, dim, on="k", salt_from="row_id", n_salts=4, how=how
            ).collect()
        )
        plain = sorted((r["row_id"], r["tag"]) for r in hot.join(dim, "k", how).collect())
        assert salted == plain, how


def test_salted_join_rejects_small_side_preserving(spark, hot):
    dim = spark.createDataFrame([("hot", "H")], "k string, tag string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(hot, dim, on="k", salt_from="row_id", how="right")


def test_salted_rollup_plan_shuffles_on_salt_then_key(spark):
    """The scale contract itself: shuffle 1 must partition on
    (key, _salt), shuffle 2 on the key alone."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["skew_salted_rollup"](spark, "/root/testdata/sf0.01")
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert any("_salt" in l and "l_returnflag" in l for l in exchanges), exchanges
    assert any("_salt" not in l and "l_returnflag" in l for l in exchanges), exchanges
