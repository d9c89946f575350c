"""HRow / QueryResult — client-edge row extraction API (SURVEY §2.3).

Reference: QueryResult extraction ops (Schema.scala:53-226) over
DeserializedResult (DeserializedResult.scala:18-111), wrapped by user
row classes (HRow.scala:21; e.g. WebPageRow, WebCrawlSchemaTest.scala:38-40).

In our engine rows only materialize at the client edge — the engine
itself is columnar DataFrames; this wrapper is what ``single()`` /
``multi_map()`` / ``scan()`` hand to user code.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Row


class HRow:
    """One materialized row.  Subclass to add domain methods (the
    WebPageRow pattern)."""

    def __init__(self, table, row: Row):
        self.table = table
        self._row = row
        self._d = row.asDict(recursive=False)

    # E9 — rowid (Schema.scala:223)
    @property
    def rowid(self) -> Any:
        return self._d.get("rowkey")

    def _resolve(self, ref):
        return self.table.resolve_column(ref)

    # E1 — column(_.c): Option[V] (Schema.scala:85-94)
    def column(self, ref) -> Any | None:
        col = self._resolve(ref)
        return self._d.get(col.name)

    # E5 — isColumnPresent (Schema.scala:68-71)
    def is_column_present(self, ref) -> bool:
        return self.column(ref) is not None

    # E3 — family(_.fam): Map[K,V] (Schema.scala:201-205)
    def family(self, ref) -> dict:
        fam = self._resolve(ref)
        if fam.is_map_family:
            return dict(self._d.get(fam.name) or {})
        return {q: self._d[q] for q in fam.columns if self._d.get(q) is not None}

    # E4 — familyKeySet (Schema.scala:215-218)
    def family_key_set(self, ref) -> set:
        return set(self.family(ref).keys())

    # E2 — columnFromFamily(_.fam, key) (Schema.scala:107-116)
    def column_from_family(self, ref, key) -> Any | None:
        return self.family(ref).get(key)

    # -- timestamps (the DeserializedResult timestamp lookaside) ----------
    def _ts_map(self, fam) -> dict:
        return dict(self._d.get(fam.ts_name) or {})

    # E6 — columnTimestamp(_.c) (Schema.scala:150-159)
    def column_timestamp(self, ref):
        col = self._resolve(ref)
        return self._ts_map(col.family).get(col.qualifier)

    # E7 — columnFromFamilyTimestamp(_.fam, k) (Schema.scala:129-138)
    def column_from_family_timestamp(self, ref, key):
        fam = self._resolve(ref)
        return self._ts_map(fam).get(key)

    # E8 — familyLatestTimestamp (Schema.scala:171-190)
    def family_latest_timestamp(self, ref):
        fam = self._resolve(ref)
        ts = self._ts_map(fam).values()
        return max(ts) if ts else None

    # E10 — size / prettyPrint (HRow.scala:27-69)
    @property
    def size(self) -> int:
        return sum(1 for v in self._d.values() if v is not None)

    def pretty_format(self, include_values: bool = True) -> str:
        parts = []
        for k, v in self._d.items():
            if v is None:
                continue
            parts.append(f"{k}={v!r}" if include_values else k)
        tname = getattr(self.table, "_table_name", self.table.name)
        return f"{tname}[{self.rowid!r}]({', '.join(parts)})"

    def pretty_print(self) -> None:
        print(self.pretty_format())

    def as_dict(self) -> dict:
        return dict(self._d)

    def __repr__(self):
        return self.pretty_format(include_values=False)


def build_rows(table, rows: Iterable[Row]) -> list[HRow]:
    builder = table.row_builder or HRow
    return [builder(table, r) for r in rows]
