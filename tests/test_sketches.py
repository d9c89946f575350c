"""HLL sketch rollup: estimates near exact, union consistency."""

from pyspark.sql import functions as F

from hpaste_spark.operators.sketches import hll_rollup
from hpaste_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_hll_rollup_estimates_and_union(spark):
    o = load_table(spark, SF, "orders")
    got = {r.grp: r.approx_distinct for r in hll_rollup(o, "o_orderpriority", "o_custkey").collect()}
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority").agg(F.count_distinct("o_custkey").alias("n")).collect()
    }
    exact["ALL"] = o.select(F.count_distinct("o_custkey")).first()[0]
    assert set(got) == set(exact) and "ALL" in got
    for g, e in exact.items():
        assert abs(got[g] - e) <= max(3, 0.05 * e), (g, got[g], e)
    # union bound: the ALL estimate can't be below the largest group's
    assert got["ALL"] >= max(v for g, v in got.items() if g != "ALL")


def test_hll_rollup_deterministic(spark):
    o = load_table(spark, SF, "orders")
    a = sorted(map(tuple, hll_rollup(o, "o_orderpriority", "o_custkey").collect()))
    b = sorted(map(tuple, hll_rollup(o, "o_orderpriority", "o_custkey").collect()))
    assert a == b
