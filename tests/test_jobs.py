"""HJob DAG layer + the canonical end-to-end aggregation job —
the WebSearchAggregationJob port (WebCrawlSchemaTest.scala:82-130,
:246-281): scan pages → extract domain from rowkey → explode the
searchMetrics map → groupBy(domain, day) sum → merge into site_metrics
→ read back with multi-get.  This is SURVEY §7.1 step 5, the minimum
end-to-end slice."""

import datetime as dt

from pyspark.sql import functions as F

from hpaste_spark.plans import HJob, HTask
from tests.fixtures import web_schema

D = dt.date


def _seed(spark, pages):
    op = None
    data = [
        ("http://siteA.com/1.html", {D(2011, 6, 1): 3, D(2011, 6, 2): 1}),
        ("http://siteA.com/2.html", {D(2011, 6, 1): 2}),
        ("http://siteB.com/1.html", {D(2011, 6, 2): 5}),
    ]
    for url, metrics in data:
        c = pages.put(url).value("title", url).value_map("searchMetrics", metrics)
        op = c if op is None else op + c
    op.execute(spark)


def test_web_search_aggregation_job(spark, base_dir):
    _, pages, sites = web_schema(base_dir, spark)
    _seed(spark, pages)

    def map_task(ctx, inputs):
        df = pages.to_df(ctx.spark)
        # domain extraction = the reference's new URL(rowid).getAuthority
        domain = F.regexp_extract(F.col("rowkey"), r"^https?://([^/]+)/", 1)
        ctx.counter("pages_scanned")
        return df.select(domain.alias("domain"), F.explode("searchMetrics").alias("day", "count"))

    def reduce_task(ctx, inputs):
        return (
            inputs["map"]
            .groupBy("domain", "day")
            .agg(F.sum("count").alias("total"))
        )

    def sink_task(ctx, inputs):
        agg = inputs["reduce"]
        batch = agg.groupBy("domain").agg(
            F.map_from_entries(F.collect_list(F.struct("day", "total"))).alias("searchMetrics")
        )
        schema = sites.spark_schema()
        now = dt.datetime.now()
        batch = (
            batch.withColumnRenamed("domain", "rowkey")
            .withColumn("name", F.lit(None).cast("string"))
            .withColumn("meta__ts", F.lit(None).cast(schema["meta__ts"].dataType))
            .withColumn(
                "searchMetrics__ts",
                F.transform_values(F.col("searchMetrics"), lambda k, v: F.lit(now)),
            )
            .select(*[f.name for f in schema.fields])
        )
        from hpaste_spark.operators.mutations import bulk_merge_put

        bulk_merge_put(sites, batch)
        return agg

    job = HJob(
        "aggregate-search-metrics",
        HTask("map", map_task),
        HTask("reduce", reduce_task, requires=("map",)),
        HTask("sink", sink_task, requires=("reduce",)),
    )
    result = job.run(spark)
    assert result.ok
    assert result.task_order == ["map", "reduce", "sink"]
    assert result.counters.get("pages_scanned") == 1

    # read back with multi-get (the reference asserts per-domain sums)
    rows = (
        sites.query2(spark)
        .with_keys(["siteA.com", "siteB.com"])
        .with_families("searchMetrics")
        .multi_map()
    )
    assert rows["siteA.com"].family("searchMetrics") == {D(2011, 6, 1): 5, D(2011, 6, 2): 1}
    assert rows["siteB.com"].family("searchMetrics") == {D(2011, 6, 2): 5}


def test_job_dag_validation(spark):
    with_cycle = HJob(
        "cyclic",
        HTask("a", lambda ctx, i: None, requires=("b",)),
        HTask("b", lambda ctx, i: None, requires=("a",)),
    )
    import pytest

    with pytest.raises(ValueError):
        with_cycle.run(spark, dry_run=True)

    linear = HJob(
        "linear",
        HTask("z_last", lambda ctx, i: None, requires=("first",)),
        HTask("first", lambda ctx, i: None),
    )
    res = linear.run(spark, dry_run=True)
    assert res.task_order == ["first", "z_last"]
