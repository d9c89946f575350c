"""Fixture schemas ported from the reference test suite (SURVEY §5).

- WebCrawlingSchema (WebCrawlSchemaTest.scala:17-58): ``pages`` +
  ``site_metrics``.
- ExampleSchema (ExampleSchema.scala:74-125): ``schema_example``
  exercising the full type registry.
"""

from __future__ import annotations

import dataclasses
import datetime as dt

from hpaste_spark.schema import HTable, Schema, YearDay, register_struct


@register_struct
@dataclasses.dataclass(frozen=True)
class Kitten:
    """ExampleSchema.scala:36 — custom ComplexByteConverter struct."""

    name: str
    age: int
    height: float


class WebTable(HTable):
    """WebCrawlSchemaTest.scala:22-42."""

    def __init__(self, schema: Schema):
        super().__init__(schema, "pages", key_type=str)
        meta = self.family("meta")
        self.title = self.column(meta, "title", str)
        self.lastCrawled = self.column(meta, "lastCrawled", dt.datetime)
        text = self.family("text", compressed=True)
        self.article = self.column(text, "article", str)
        self.attributes = self.column(text, "attributes", dict[str, str])
        self.searchMetrics = self.family_map("searchMetrics", dt.date, int)


class SiteMetricsTable(HTable):
    """WebCrawlSchemaTest.scala:45-56."""

    def __init__(self, schema: Schema):
        super().__init__(schema, "site_metrics", key_type=str)
        meta = self.family("meta")
        self.name = self.column(meta, "name", str)
        self.searchMetrics = self.family_map("searchMetrics", dt.date, int)


class ExampleTable(HTable):
    """ExampleSchema.scala:84-118 — full type-registry coverage."""

    def __init__(self, schema: Schema):
        super().__init__(schema, "schema_example", key_type=str)
        meta = self.family("meta")
        self.title = self.column(meta, "title", str)
        self.url = self.column(meta, "url", str)
        self.views = self.column(meta, "views", "long")
        self.creationDate = self.column(meta, "creationDate", dt.datetime)
        self.viewsArr = self.column(meta, "viewsArr", list[str])
        self.viewsMap = self.column(meta, "viewsMap", dict[str, int])
        self.viewCounts = self.family_map("viewCounts", str, "long")
        self.viewCountsByDay = self.family_map("viewCountsByDay", YearDay, "long")
        self.kittens = self.family_map("kittens", str, Kitten)
        misc = self.family("misc")
        self.misc1 = self.column(misc, "misc1", str)
        self.misc2 = self.column(misc, "misc2", str)
        self.misc3 = self.column(misc, "misc3", str)


def web_schema(base_dir: str, spark):
    sch = Schema(base_dir=base_dir)
    pages = WebTable(sch)
    sites = SiteMetricsTable(sch)
    sch.create_all(spark)
    return sch, pages, sites


def example_schema(base_dir: str, spark):
    sch = Schema(base_dir=base_dir)
    tbl = ExampleTable(sch)
    sch.create_all(spark)
    return sch, tbl
