"""TTL vacuum, compaction, text source/sink, job accumulators."""

import datetime as dt

from hpaste_spark.schema import HTable, Schema

TS = dt.datetime


def test_vacuum_ttl_drops_expired_cells(spark, base_dir):
    from hpaste_spark.operators.maintenance import vacuum_ttl

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "ttl_table", key_type=str)
    fam = t.family("meta", row_ttl_seconds=3600)
    t.column(fam, "v", "long")
    t.family_map("counts", str, "long", row_ttl_seconds=3600)
    t.create(spark)

    now = TS(2024, 1, 1, 12, 0)
    old = now - dt.timedelta(hours=2)
    fresh = now - dt.timedelta(minutes=5)
    (
        t.put("stale").value("v", 1, timestamp=old)
        .put("live").value("v", 2, timestamp=fresh)
        .put("mixed").value_map("counts", {"a": 1, "b": 2}, timestamps={"a": old, "b": fresh})
        .execute(spark)
    )
    vacuum_ttl(t, spark, now=now)
    rows = {r.rowid: r for r in t.query2(spark).with_all_columns().scan_to_iterable(lambda r: r)}
    assert "stale" not in rows  # all cells expired → row gone
    assert rows["live"].column("v") == 2
    assert rows["mixed"].family("counts") == {"b": 2}


def test_compact_rewrites_snapshot(spark, base_dir):
    from hpaste_spark.operators.maintenance import compact

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "cmp", key_type=str)
    fam = t.family("meta")
    t.column(fam, "v", "long")
    t.create(spark)
    t.put("a").value("v", 1).execute(spark)
    v_before = t.storage.current_version()
    compact(t, spark, num_files=1)
    assert t.storage.current_version() == v_before + 1
    assert t.query2(spark).with_key("a").with_all_columns().single().column("v") == 1


def test_text_source_sink_roundtrip(spark, tmp_path):
    from hpaste_spark.sources.text_io import merge_parts_to_file, read_lines, write_lines

    out = str(tmp_path / "lines_out")
    df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "value string")
    write_lines(df, out)
    back = sorted(r["value"] for r in read_lines(spark, out).collect())
    assert back == ["alpha", "beta", "gamma"]

    merged = str(tmp_path / "merged.txt")
    merge_parts_to_file(out, merged)
    assert sorted(open(merged).read().split()) == ["alpha", "beta", "gamma"]


def test_job_accumulator_counts_executor_side(spark):
    from hpaste_spark.plans import HJob, HTask

    def count_rows(ctx, inputs):
        acc = ctx.accumulator("rows_seen")
        df = ctx.spark.range(100)
        df.foreach(lambda row: acc.add(1))
        return df

    job = HJob("acc-job", HTask("count", count_rows))
    res = job.run(spark)
    assert res.counters["rows_seen"] == 100


def test_snapshot_time_travel_and_vacuum(spark, base_dir):
    """Every mutation batch publishes an immutable snapshot: read
    (version=N) must reproduce the pre-mutation state exactly;
    vacuum_versions drops old snapshots but never the current one."""
    import pytest

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "tt_table", key_type=str, keep_versions=10)
    fam = t.family("meta")
    t.column(fam, "v", "long")
    t.create(spark)

    t.put("a").value("v", 1).execute(spark)       # v2 (create wrote v1)
    t.put("a").value("v", 2).put("b").value("v", 9).execute(spark)  # v3
    t.delete("b").execute(spark)                   # v4

    st = t.storage
    vs = st.versions()
    assert st.current_version() == vs[-1] and len(vs) >= 4

    def vals(version=None):
        df = st.read(spark, version=version)
        return {r["rowkey"]: r["v"] for r in df.select("rowkey", "v").collect()}

    assert vals() == {"a": 2}
    assert vals(vs[-2]) == {"a": 2, "b": 9}        # before the delete
    assert vals(vs[-3]) == {"a": 1}                # before the second put

    removed = st.vacuum_versions(keep_last=2)
    assert st.current_version() in st.versions()
    assert len(st.versions()) == 2
    assert set(removed) | set(st.versions()) == set(vs)
    assert vals() == {"a": 2}                      # current unaffected
    assert vals(st.versions()[0]) == {"a": 2, "b": 9}
    with pytest.raises(FileNotFoundError):
        st.read(spark, version=vs[0])


def test_query_dsl_as_of_version(spark, base_dir):
    """as_of_version routes the whole query DSL (filters, projections)
    through an old snapshot."""
    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "tt_dsl", key_type=str, keep_versions=10)
    fam = t.family("meta")
    t.column(fam, "v", "long")
    t.create(spark)

    t.put("a").value("v", 1).execute(spark)
    pre_delete = t.storage.current_version()
    t.delete("a").execute(spark)

    assert t.query2(spark).with_key("a").with_all_columns().single_option() is None
    old = (
        t.query2(spark)
        .as_of_version(pre_delete)
        .with_key("a")
        .with_all_columns()
        .single_option()
    )
    assert old is not None and old.column("v") == 1


def test_changes_between_snapshots(spark, base_dir):
    """CDC diff: inserts, updates, deletes classified; unchanged rows
    (including null-valued cells) excluded."""
    from hpaste_spark.operators.maintenance import changes_between

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "cdc", key_type=str, keep_versions=10)
    fam = t.family("meta")
    t.column(fam, "v", "long")
    t.column(fam, "w", "long")
    t.create(spark)

    (
        t.put("keep").value("v", 1)
        .put("upd").value("v", 1)
        .put("del").value("v", 9)
        .put("nullcase").value("v", 5)  # w stays null in both versions
        .execute(spark)
    )
    v_from = t.storage.current_version()
    (
        t.put("upd").value("v", 2)
        .put("new").value("v", 7)
        .put("nullfill").value("w", 3)  # insert with null v
        .delete("del")
        .execute(spark)
    )
    v_to = t.storage.current_version()

    rows = {r["rowkey"]: r for r in changes_between(t, spark, v_from, v_to).collect()}
    assert set(rows) == {"upd", "new", "del", "nullfill"}  # keep & nullcase absent
    assert rows["upd"]["_change"] == "update" and rows["upd"]["v"] == 2
    assert rows["new"]["_change"] == "insert" and rows["new"]["v"] == 7
    assert rows["del"]["_change"] == "delete" and rows["del"]["v"] == 9
    assert rows["nullfill"]["_change"] == "insert" and rows["nullfill"]["w"] == 3
