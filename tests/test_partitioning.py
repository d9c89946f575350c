"""Key-prefix partitioned storage: directory-level pruning for point
gets and rowkey ranges (the HBase sorted-region analog, SURVEY §1.4).
"""

from hpaste_spark.schema import HTable, Schema


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


class KpTable(HTable):
    def __init__(self, schema: Schema):
        super().__init__(schema, "kp_table", key_type=str, partition_prefix_len=1)
        meta = self.family("meta")
        self.v = self.column(meta, "v", "long")


def _make(spark, base_dir):
    sch = Schema(base_dir=base_dir)
    tbl = KpTable(sch)
    sch.create_all(spark)
    op = None
    for key, v in [("a1", 1), ("a2", 2), ("b1", 3), ("c1", 4), ("c2", 5)]:
        op = (op.put(key) if op else tbl.put(key)).value("v", v)
    op.execute(spark)
    return tbl


def test_point_get_prunes_partition_dirs(spark, base_dir):
    tbl = _make(spark, base_dir)
    q = tbl.query2(spark).with_key("a1").with_all_columns()
    plan = plan_of(q.to_df())
    assert "PartitionFilters" in plan and "_kp" in plan, (
        "point get must constrain the _kp partition directory"
    )
    assert q.single().column("v") == 1


def test_range_scan_prunes_and_matches(spark, base_dir):
    tbl = _make(spark, base_dir)
    q = tbl.query2(spark).with_start_row("a2").with_end_row("c1").with_all_columns()
    rows = {r.rowid: r.column("v") for r in q.scan_to_iterable(lambda r: r)}
    assert rows == {"a2": 2, "b1": 3}
    plan = plan_of(q.to_df())
    assert "PartitionFilters" in plan and "_kp" in plan


def test_multiget_prefix_pruning(spark, base_dir):
    tbl = _make(spark, base_dir)
    q = tbl.query2(spark).with_keys({"a1", "c2"}).with_all_columns()
    got = q.multi_map()
    assert {k: r.column("v") for k, r in got.items()} == {"a1": 1, "c2": 5}


def test_unpartitioned_table_unaffected(spark, base_dir):
    sch = Schema(base_dir=base_dir)

    class Plain(HTable):
        def __init__(self, schema):
            super().__init__(schema, "plain_table", key_type=str)
            meta = self.family("meta")
            self.v = self.column(meta, "v", "long")

    tbl = Plain(sch)
    sch.create_all(spark)
    tbl.put("x1").value("v", 9).execute(spark)
    assert tbl.query2(spark).with_key("x1").with_all_columns().single().column("v") == 9


def test_partial_rewrite_touches_only_mutated_partitions(spark, base_dir):
    """A mutation batch on prefix-partitioned storage rewrites only its
    touched partitions; untouched partition files are HARDLINKED from
    the previous snapshot (same inodes — no data copied)."""
    import os

    tbl = _make(spark, base_dir)  # v2: partitioned snapshot (a, b, c)
    st = tbl.storage
    v_before = st.current_version()
    before_files = {}
    for entry in os.listdir(st.snapshot_dir(v_before)):
        if entry.startswith("_kp="):
            d = os.path.join(st.snapshot_dir(v_before), entry)
            before_files[entry] = {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d)}

    tbl.put("a9").value("v", 99).execute(spark)  # touches only prefix 'a'

    v_after = st.current_version()
    assert v_after == v_before + 1
    after_dir = st.snapshot_dir(v_after)
    # untouched partitions: identical inodes (hardlinks, not copies)
    for entry in ("_kp=b", "_kp=c"):
        d = os.path.join(after_dir, entry)
        after = {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d)}
        assert after == before_files[entry], f"{entry} should be hardlinked"

    # all data still correct, including the new row and old rows everywhere
    rows = {r["rowkey"]: r["v"] for r in tbl.to_df(spark).collect()}
    assert rows == {"a1": 1, "a2": 2, "a9": 99, "b1": 3, "c1": 4, "c2": 5}


def test_partial_rewrite_delete_and_gc_safety(spark, base_dir):
    """Deleting a row rewrites its partition; GC of old snapshots must
    not corrupt hardlink-shared files in the live snapshot."""
    tbl = _make(spark, base_dir)
    tbl.delete("c1").execute(spark)
    tbl.put("b7").value("v", 7).execute(spark)   # triggers GC of older snapshots
    tbl.put("a3").value("v", 3).execute(spark)
    rows = {r["rowkey"]: r["v"] for r in tbl.to_df(spark).collect()}
    assert rows == {"a1": 1, "a2": 2, "a3": 3, "b1": 3, "b7": 7, "c2": 5}
    # point get through the DSL still prunes and reads correctly
    assert tbl.query2(spark).with_key("c2").with_all_columns().single().column("v") == 5


def test_concurrent_writers_never_lose_updates(spark, base_dir):
    """Commit-lock protocol: a second writer racing the same version
    must FAIL (ConcurrentWriteError), not silently clobber the first."""
    import os
    import time

    import pytest

    from hpaste_spark.sources.storage import ConcurrentWriteError

    sch = Schema(base_dir=base_dir)
    tbl = KpTable(sch)
    sch.create_all(spark)
    tbl.put("k1").value("v", 1).execute(spark)
    storage = tbl.storage

    # writer B holds the claim for the next version → writer A must fail
    nxt = storage.current_version() + 1
    claim = storage._claim(nxt)
    with pytest.raises(ConcurrentWriteError):
        tbl.put("k2").value("v", 2).execute(spark)
    # the losing batch was NOT applied and the version did not move
    assert storage.current_version() == nxt - 1
    assert tbl.query2(spark).with_all_columns().scan_to_iterable(lambda r: r.rowid) == ["k1"]

    # stale claim (crashed writer): next writer breaks it and proceeds
    old = time.time() - storage.claim_ttl_s - 10
    os.utime(claim, (old, old))
    tbl.put("k3").value("v", 3).execute(spark)
    assert storage.current_version() == nxt
    got = sorted(tbl.query2(spark).with_all_columns().scan_to_iterable(lambda r: r.rowid))
    assert got == ["k1", "k3"]
    assert not os.path.exists(claim), "claim released after publish"
