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
