"""Structured Streaming mirror: the streaming tumbling-window agg must
produce the same result as the batch query (SURVEY §2.9 stretch goal)."""

import shutil

from pyspark.sql import functions as F

from hpaste_spark.sources.catalog import load_table
from hpaste_spark.streaming.events import read_event_stream, run_to_memory, tumbling_counts

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark, tmp_path):
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "events.parquet")
    src = str(src_dir)

    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    run_to_memory(tumbling_counts(stream, "1 hour"), "tumbling_test")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("tumbling_test").collect()
    }

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want
