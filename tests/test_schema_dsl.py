"""Schema declaration + DDL emission tests (ExampleSchema.scala:172-198)."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from tests.fixtures import ExampleTable, WebTable, example_schema, web_schema


def test_spark_schema_shapes(spark, base_dir):
    _, pages, sites = web_schema(base_dir, spark)
    schema = pages.spark_schema()
    names = [f.name for f in schema.fields]
    assert names == [
        "rowkey",
        "title",
        "lastCrawled",
        "meta__ts",
        "article",
        "attributes",
        "text__ts",
        "searchMetrics",
        "searchMetrics__ts",
    ]
    assert isinstance(schema["searchMetrics"].dataType, T.MapType)
    assert isinstance(schema["searchMetrics"].dataType.keyType, T.DateType)
    assert isinstance(schema["searchMetrics"].dataType.valueType, T.LongType)


def test_full_type_registry(spark, base_dir):
    _, tbl = example_schema(base_dir, spark)
    schema = tbl.spark_schema()
    assert isinstance(schema["viewsArr"].dataType, T.ArrayType)
    assert isinstance(schema["viewsMap"].dataType, T.MapType)
    # YearDay-keyed family → MAP<STRUCT<year,day>, BIGINT>
    byday = schema["viewCountsByDay"].dataType
    assert isinstance(byday.keyType, T.StructType)
    assert [f.name for f in byday.keyType.fields] == ["year", "day"]
    # Kitten struct values
    kit = schema["kittens"].dataType.valueType
    assert [f.name for f in kit.fields] == ["name", "age", "height"]


def test_ddl_scripts(spark, base_dir):
    _, pages, _ = web_schema(base_dir, spark)
    ddl = pages.create_script()
    assert "CREATE TABLE pages" in ddl
    assert "searchMetrics map<date,bigint>" in ddl
    assert "family text: compressed" in ddl
    assert pages.delete_script() == "DROP TABLE IF EXISTS pages"
    alter = pages.alter_script(existing_columns={"rowkey", "title"})
    assert "ALTER TABLE pages ADD COLUMNS" in alter
    assert "title" not in alter and "searchMetrics" in alter
    assert "up to date" in pages.alter_script({f.name for f in pages.spark_schema().fields})


def test_duplicate_column_rejected(spark, base_dir):
    from hpaste_spark.schema import Schema, HTable

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "dup", key_type=str)
    fam = t.family("meta")
    t.column(fam, "x", str)
    with pytest.raises(ValueError):
        t.column(fam, "x", int)


def test_map_family_rejects_typed_columns(spark, base_dir):
    from hpaste_spark.schema import Schema, HTable

    sch = Schema(base_dir=base_dir)
    t = HTable(sch, "mf", key_type=str)
    fam = t.family_map("m", str, int)
    with pytest.raises(ValueError):
        t.column(fam, "x", str)
