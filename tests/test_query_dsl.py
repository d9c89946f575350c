"""Read-path DSL tests: scans, filters, multi-get semantics, pagination,
early-exit, cache — ported behaviors from WebCrawlSchemaTest.scala
(:307-330 substring filter, :353-370 batching, :372-389 multi-get empty
rows) and ExampleSchema.scala (:326-352 filter-if-missing)."""

import datetime as dt

import pytest

from tests.fixtures import example_schema, web_schema

D = dt.date
TS = dt.datetime


def _seed_pages(spark, pages, n=10):
    op = None
    for i in range(n):
        url = f"http://site{i % 3}.com/page{i}.html"
        chain = (
            pages.put(url)
            .value("title", f"Title {i}")
            .value("article", f"lorem ipsum {'special' if i % 2 == 0 else 'ordinary'} text {i}")
            .value_map("searchMetrics", {D(2011, 6, 1 + (i % 5)): i + 1})
        )
        op = chain if op is None else op + chain
    op.execute(spark)


def test_scan_with_substring_filter(spark, base_dir):
    """WebCrawlSchemaTest.scala:307-330."""
    _, pages, _ = web_schema(base_dir, spark)
    _seed_pages(spark, pages)
    got = []
    (
        pages.query2(spark)
        .with_families("meta", "text")
        .filter(lambda c: c.column_value_must_contain("article", "special"))
        .scan(lambda row: got.append(row.column("title")))
    )
    assert sorted(got) == [f"Title {i}" for i in range(0, 10, 2)]


def test_filter_if_missing_semantics(spark, base_dir):
    """ExampleSchema.scala:326-352 — rows lacking the filtered column are
    dropped (SingleColumnValueFilter.setFilterIfMissing(true))."""
    _, tbl = example_schema(base_dir, spark)
    tbl.put("HasViews").value("views", 10).execute(spark)
    tbl.put("NoViews").value("title", "T").execute(spark)
    rows = (
        tbl.query2(spark)
        .with_all_columns()
        .filter(lambda c: c.column_value_must_be_greater_than("views", 5))
        .scan_to_iterable(lambda r: r.rowid)
    )
    assert rows == ["HasViews"]
    # presence filter
    rows = (
        tbl.query2(spark)
        .with_all_columns()
        .filter(lambda c: c.column_value_must_be_present("views"))
        .scan_to_iterable(lambda r: r.rowid)
    )
    assert rows == ["HasViews"]


def test_filter_or_groups(spark, base_dir):
    """Query2.scala:63-127 — OR across clause groups."""
    _, tbl = example_schema(base_dir, spark)
    tbl.put("A").value("views", 1).execute(spark)
    tbl.put("B").value("views", 100).execute(spark)
    tbl.put("C").value("title", "tc").execute(spark)
    rows = (
        tbl.query2(spark)
        .with_all_columns()
        .filter_or(
            lambda c: c.column_value_must_be_greater_than("views", 50),
            lambda c: c.column_value_must_equal("title", "tc"),
        )
        .scan_to_iterable(lambda r: r.rowid)
    )
    assert sorted(rows) == ["B", "C"]


def test_multi_get_empty_rows(spark, base_dir):
    """WebCrawlSchemaTest.scala:372-389."""
    _, pages, _ = web_schema(base_dir, spark)
    pages.put("http://x.com/1").value("title", "X").execute(spark)
    res = (
        pages.query2(spark)
        .with_keys(["http://x.com/1", "http://missing.com/"])
        .with_columns("title")
        .multi_map(return_empty_rows=True)
    )
    assert res["http://x.com/1"].column("title") == "X"
    assert res["http://missing.com/"].column("title") is None
    res2 = (
        pages.query2(spark)
        .with_keys(["http://x.com/1", "http://missing.com/"])
        .with_columns("title")
        .multi_map(return_empty_rows=False)
    )
    assert set(res2) == {"http://x.com/1"}


def test_single_vs_single_option(spark, base_dir):
    _, pages, _ = web_schema(base_dir, spark)
    assert pages.query2(spark).with_key("nope").with_all_columns().single_option() is None
    with pytest.raises(KeyError):
        pages.query2(spark).with_key("nope").with_all_columns().single()


def test_minimum_selection_guard(spark, base_dir):
    """Query2.scala:378-394 (P5)."""
    _, pages, _ = web_schema(base_dir, spark)
    with pytest.raises(ValueError):
        pages.query2(spark).with_key("k").to_df()


def test_map_qualifier_range_and_pagination(spark, base_dir):
    """F13/F14 (Query2.scala:239-290) + F16 (:316-326)."""
    _, tbl = example_schema(base_dir, spark)
    tbl.put("P").value_map("viewCounts", {f"time{i}": i for i in range(1, 7)}).execute(spark)
    row = (
        tbl.query2(spark)
        .with_families("viewCounts")
        .filter(lambda c: c.between_column_keys("viewCounts", "time2", "time4"))
        .single()
    )
    assert row.family("viewCounts") == {"time2": 2, "time3": 3, "time4": 4}
    row = (
        tbl.query2(spark)
        .with_pagination_for_family("viewCounts", page_size=2, page_offset=1)
        .single()
    )
    assert row.family("viewCounts") == {"time3": 3, "time4": 4}


def test_columns_in_family_selection(spark, base_dir):
    """P2 (Query2.scala:430-436)."""
    _, tbl = example_schema(base_dir, spark)
    tbl.put("P2").value_map("viewCounts", {"a": 1, "b": 2, "c": 3}).execute(spark)
    row = tbl.query2(spark).with_columns_in_family("viewCounts", "a", "c").single()
    assert row.family("viewCounts") == {"a": 1, "c": 3}


def test_rowkey_range_scan(spark, base_dir):
    """F19 — lexicographic start/stop row (Query2.scala:903-908)."""
    _, tbl = example_schema(base_dir, spark)
    op = None
    for k in ["a1", "a2", "b1", "b2", "c1"]:
        c = tbl.put(k).value("title", k)
        op = c if op is None else op + c
    op.execute(spark)
    rows = (
        tbl.query2(spark)
        .with_start_row("a2")
        .with_end_row("c1")
        .with_columns("title")
        .scan_to_iterable(lambda r: r.rowid)
    )
    assert sorted(rows) == ["a2", "b1", "b2"]


def test_scan_until_early_exit(spark, base_dir):
    """S5 (Query2.scala:1016-1040)."""
    _, tbl = example_schema(base_dir, spark)
    op = None
    for i in range(20):
        c = tbl.put(f"k{i:02d}").value("views", i)
        op = c if op is None else op + c
    op.execute(spark)
    seen = []

    def handler(row):
        seen.append(row.rowid)
        return len(seen) < 5

    tbl.query2(spark).with_all_columns().scan_until(handler)
    assert len(seen) == 5


def test_time_range_read(spark, base_dir):
    """F20 — cell-timestamp range [start, end) (Query2.scala:493-495)."""
    _, tbl = example_schema(base_dir, spark)
    t_old = TS(2012, 1, 1)
    t_new = TS(2014, 1, 1)
    (
        tbl.put("TR")
        .value_map("viewCounts", {"old": 1}, timestamps={"old": t_old})
        .value_map("viewCounts", {"new": 2}, timestamps={"new": t_new})
        .execute(spark)
    )
    row = (
        tbl.query2(spark)
        .with_families("viewCounts")
        .between_dates(TS(2013, 1, 1), TS(2015, 1, 1))
        .single()
    )
    assert row.family("viewCounts") == {"new": 2}


def test_result_cache(spark, base_dir):
    """SURVEY §2.7 — read-through cache with TTL (ResultCaching.scala:92-152)."""
    from hpaste_spark.operators import TestCache

    _, tbl = example_schema(base_dir, spark)
    tbl.cache = TestCache()
    tbl.put("CK").value("views", 1).execute(spark)
    r1 = tbl.query2(spark).with_key("CK").with_all_columns().single_option(skip_cache=False)
    assert tbl.cache.misses == 1
    r2 = tbl.query2(spark).with_key("CK").with_all_columns().single_option(skip_cache=False)
    assert tbl.cache.hits == 1
    assert r2.column("views") == r1.column("views")


def test_duplicate_selection_tolerated(spark, base_dir):
    """ExampleSchema.scala:156-167."""
    _, tbl = example_schema(base_dir, spark)
    tbl.put("DD").value("title", "t").execute(spark)
    row = (
        tbl.query2(spark)
        .with_columns("title", "title")
        .with_families("meta")
        .single()
    )
    assert row.column("title") == "t"


def test_cache_key_isolates_snapshot_versions(spark, base_dir):
    """An as_of_version(N) query must not be served another snapshot's
    cached result (cache key includes every plan-shaping input)."""
    from hpaste_spark.operators import TestCache

    _, tbl = example_schema(base_dir, spark)
    tbl.cache = TestCache()
    tbl.put("VK").value("views", 1).execute(spark)
    v1 = tbl.storage.current_version()
    tbl.put("VK").value("views", 99).execute(spark)

    cur = tbl.query2(spark).with_key("VK").with_all_columns().single_option(skip_cache=False)
    old = (
        tbl.query2(spark)
        .as_of_version(v1)
        .with_key("VK")
        .with_all_columns()
        .single_option(skip_cache=False)
    )
    assert cur.column("views") == 99
    assert old.column("views") == 1, "time-travel read served the cached current snapshot"
    assert tbl.cache.misses == 2, "different snapshots must be different cache entries"


def test_scan_cache_ttl_expiry_and_writeback_counts(spark, base_dir, monkeypatch):
    """Scan-tier TTL semantics (Query2.scala:944 putScanResult/
    getScanResult; TestCache TTL ResultCaching.scala:92-152): a cached
    whole-scan result serves repeat scans without recompute until its
    local TTL passes, then the next scan misses, recomputes, and writes
    back — observable through the instrument_request hook
    (ResultCaching.scala:58) and the cache's own hit/miss counters."""
    from hpaste_spark.operators import TestCache
    from hpaste_spark.operators import cache as cache_mod

    class InstrumentedCache(TestCache):
        def __init__(self):
            super().__init__()
            self.instrumented = []   # (requested, local, remote, miss)
            self.scan_puts = 0

        def instrument_request(self, requested, local_hits, remote_hits, misses):
            self.instrumented.append((requested, local_hits, remote_hits, misses))

        def put_scan_result(self, key, value, ttl_seconds):
            self.scan_puts += 1
            super().put_scan_result(key, value, ttl_seconds)

    # controllable clock: TestCache expires on time.monotonic()
    now = [1000.0]
    monkeypatch.setattr(cache_mod.time, "monotonic", lambda: now[0])

    _, tbl = example_schema(base_dir, spark)
    tbl.cache = InstrumentedCache()
    tbl.put("SC1").value("views", 7).execute(spark)

    def run_scan():
        seen = []
        (tbl.query2(spark).with_all_columns()
            .scan(lambda row: seen.append(row), use_local_cache=True, local_ttl=30))
        return seen

    assert len(run_scan()) >= 1            # cold: miss + writeback
    assert tbl.cache.scan_puts == 1
    assert tbl.cache.instrumented[-1] == (1, 0, 0, 1)

    now[0] += 10                            # inside TTL: local hit, no recompute
    assert len(run_scan()) >= 1
    assert tbl.cache.scan_puts == 1
    assert tbl.cache.instrumented[-1] == (1, 1, 0, 0)
    assert tbl.cache.hits == 1

    now[0] += 31                            # past TTL: expired -> miss + fresh writeback
    assert len(run_scan()) >= 1
    assert tbl.cache.scan_puts == 2
    assert tbl.cache.instrumented[-1] == (1, 0, 0, 1)
    assert tbl.cache.misses == 2
    assert [i for i in tbl.cache.instrumented] == [
        (1, 0, 0, 1), (1, 1, 0, 0), (1, 0, 0, 1)
    ]


def test_single_option_async_mirrors_sync_and_enforces_one_family(spark, base_dir):
    """S6 (Query2.scala:461-477): async point get returns a Future
    resolving to the same row the sync terminal yields, and rejects
    multi-family selections exactly as the reference require()s."""
    from concurrent.futures import Future

    _, pages, _ = web_schema(base_dir, spark)
    pages.put("http://x.com/1").value("title", "X").execute(spark)
    fut = (
        pages.query2(spark)
        .with_key("http://x.com/1")
        .with_columns("title")
        .single_option_async()
    )
    assert isinstance(fut, Future)
    row = fut.result(timeout=120)
    assert row.column("title") == pages.query2(spark).with_key(
        "http://x.com/1"
    ).with_columns("title").single().column("title")

    # absent key resolves to None (noneOnEmpty=true default)
    assert (
        pages.query2(spark)
        .with_key("nope")
        .with_columns("title")
        .single_option_async()
        .result(timeout=120)
        is None
    )

    # several in flight at once — the pooled-client shape
    futs = [
        pages.query2(spark).with_key(k).with_columns("title").single_option_async()
        for k in ("http://x.com/1", "nope", "http://x.com/1")
    ]
    got = [f.result(timeout=120) for f in futs]
    assert got[0] is not None and got[1] is None and got[2] is not None

    with pytest.raises(ValueError, match="exactly one family"):
        pages.query2(spark).with_key("k").with_families(
            "meta", "text"
        ).single_option_async()


def test_multi_map_async_mirrors_sync_multi_get(spark, base_dir):
    """S6 multi-get parity (ExampleSchema.scala:301-324): the async
    keySet get resolves to the same rowid→row dict the sync multi_map
    terminal yields — including return_empty_rows entries — and
    enforces the same one-family contract eagerly."""
    from concurrent.futures import Future

    _, pages, _ = web_schema(base_dir, spark)
    pages.put("http://m.com/1").value("title", "A").execute(spark)
    pages.put("http://m.com/2").value("title", "B").execute(spark)
    keys = ["http://m.com/1", "http://m.com/2", "http://m.com/absent"]

    def query():
        return pages.query2(spark).with_keys(keys).with_columns("title")

    fut = query().multi_map_async(return_empty_rows=True)
    assert isinstance(fut, Future)
    got = fut.result(timeout=180)
    want = query().multi_map(return_empty_rows=True)
    assert set(got) == set(want) == set(keys)
    for k in keys:
        assert got[k].column("title") == want[k].column("title")

    # without empty rows: the absent key is simply missing, same as sync
    assert set(query().multi_map_async().result(timeout=180)) == set(
        query().multi_map()
    )

    with pytest.raises(ValueError, match="exactly one family"):
        pages.query2(spark).with_keys(keys).with_families(
            "meta", "text"
        ).multi_map_async()
