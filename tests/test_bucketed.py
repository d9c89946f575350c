"""Bucketed co-located joins: the write-once-shuffle-never path."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpaste_spark.sources.bucketed import read_table, write_bucketed
from hpaste_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_cobucketed_join_plans_no_exchange_and_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "bk_lineitem", "l_orderkey", n_buckets=8, sort_cols="l_orderkey")
    write_bucketed(orders, "bk_orders", "o_orderkey", n_buckets=8, sort_cols="o_orderkey")
    try:
        # disable auto-broadcast so the join would OTHERWISE shuffle both
        # sides — exactly the fact-to-fact situation bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bl, bo = read_table(spark, "bk_lineitem"), read_table(spark, "bk_orders")
        j = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "co-bucketed join must inherit the write-time layout, not re-shuffle:\n" + plan
        )
        # and the layout is purely physical — results equal the plain join
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert j.count() == plain.count()
        got = j.groupBy("o_orderpriority").count().collect()
        want = plain.groupBy("o_orderpriority").count().collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_bucketed_groupby_needs_no_exchange(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "bk_li_agg", "l_orderkey", n_buckets=8)
    try:
        agg = read_table(spark, "bk_li_agg").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "aggregation on the bucket key must reuse the write-time partitioning:\n" + plan
        )
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_li_agg")
