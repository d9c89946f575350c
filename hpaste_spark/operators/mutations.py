"""Mutation batch DSL: Put / Delete / Increment → distributed merge-write.

Reference: OpBase fluent chaining + batch execute (OpBase.scala:22-114),
PutOp.value/valueMap with per-cell timestamps (PutOp.scala:28-50),
DeleteOp row/family/qualifier scopes (DeleteOp.scala:21-39),
IncrementOp atomic adds (IncrementOp.scala:26-38).  Batches apply
deletes → puts → increments in that documented order
(README.markdown:299); ``op1 + op2`` combines chains (OpBase.scala:26);
empty batches are no-ops (OpBase.scala:69-71).  Returns
``OpsResult(numDeletes, numPuts, numIncrements)`` (OpBase.scala:112-114).

Spark design: the client-staged batch becomes small DataFrames that
full-outer-merge with the stored snapshot on ``rowkey`` — the same
shape as a Delta MERGE, so the write path is a distributed join, never
a driver-side loop, and survives 100 TB tables.  (The full-outer merge
plans as a sort-merge join on rowkey — Spark cannot broadcast a
full-outer equi join; with prefix-partitioned storage only the touched
partitions would be rewritten.)  Cell-level last-writer-wins: a put only
replaces the cells it names; map-family puts overlay by key
(map_concat semantics, M2); increments add to ``coalesce(old, 0)``.
Atomicity unit is the ``execute()`` batch (one snapshot commit) —
documented divergence from HBase's row-level atomicity (SURVEY §7.2).
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpaste_spark.schema.types import to_spark_value


@dataclasses.dataclass
class OpsResult:
    """OpBase.scala:112-114; ``+`` combiner tested ExampleSchema.scala:383-410."""

    numDeletes: int = 0
    numPuts: int = 0
    numIncrements: int = 0

    def __add__(self, other: "OpsResult") -> "OpsResult":
        return OpsResult(
            self.numDeletes + other.numDeletes,
            self.numPuts + other.numPuts,
            self.numIncrements + other.numIncrements,
        )


class _RowOps:
    """Staged cells for one (rowkey, op-kind)."""

    def __init__(self):
        self.cells: dict[str, tuple[Any, Any]] = {}  # qualifier -> (value, ts)
        self.map_cells: dict[str, dict] = {}  # family -> {key: (value, ts)}


class OpBase:
    """A chained mutation batch on one table (OpBase.scala:22-109)."""

    def __init__(self, table):
        self.table = table
        self.puts: dict[Any, _RowOps] = {}
        self.increments: dict[Any, _RowOps] = {}
        self.delete_rows: set = set()
        self.delete_families: dict[Any, set] = {}
        self.delete_values: dict[Any, dict] = {}  # key -> {family: set(qualifiers)}
        self._current: tuple[str, Any] | None = None
        self._put_count = 0
        self._put_calls: dict[Any, int] = {}  # key -> put() invocations
        self._delete_count = 0
        self._increment_count = 0

    # -- chain starters (HbaseTable.scala:400-404) -----------------------
    def put(self, key, write_to_wal: bool = True):
        self._current = ("put", key)
        self.puts.setdefault(key, _RowOps())
        self._put_count += 1
        self._put_calls[key] = self._put_calls.get(key, 0) + 1
        return self

    def delete(self, key):
        self._current = ("delete", key)
        self.delete_rows.add(key)
        self._delete_count += 1
        return self

    def increment(self, key):
        self._current = ("increment", key)
        self.increments.setdefault(key, _RowOps())
        self._increment_count += 1
        return self

    # -- cell setters -----------------------------------------------------
    def _cur(self, kind: str) -> tuple[Any, _RowOps]:
        if self._current is None or self._current[0] != kind:
            raise RuntimeError(f".value()/.family() called outside a {kind}() chain")
        key = self._current[1]
        store = {"put": self.puts, "increment": self.increments}[kind]
        return key, store[key]

    def value(self, ref, v, timestamp: _dt.datetime | None = None):
        """PutOp.value (PutOp.scala:28-36) / IncrementOp.value
        (IncrementOp.scala:26-31)."""
        kind = self._current[0] if self._current else "put"
        if kind == "delete":
            raise RuntimeError("delete chains use .family()/.values()")
        key, ops = self._cur(kind)
        col = self.table.resolve_column(ref)
        from hpaste_spark.schema.table import ColumnFamily

        if isinstance(col, ColumnFamily):
            raise TypeError("value() needs a typed column; use value_map() for families")
        ops.cells[col.qualifier] = (to_spark_value(v), timestamp)
        return self

    def value_map(self, ref, kv: dict, timestamps: dict | None = None):
        """PutOp.valueMap (PutOp.scala:38-50) / IncrementOp.valueMap
        (IncrementOp.scala:33-38); per-cell timestamps tested
        ExampleSchema.scala:354-381."""
        kind = self._current[0] if self._current else "put"
        key, ops = self._cur(kind)
        fam = self.table.resolve_column(ref)
        from hpaste_spark.schema.table import ColumnFamily

        if not isinstance(fam, ColumnFamily) or not fam.is_map_family:
            raise TypeError("value_map() needs a map-style family")
        cells = ops.map_cells.setdefault(fam.name, {})
        for k, v in kv.items():
            ts = (timestamps or {}).get(k)
            cells[to_spark_value(k) if not isinstance(k, tuple) else k] = (to_spark_value(v), ts)
        return self

    def family(self, ref):
        """DeleteOp.family (DeleteOp.scala:27-31)."""
        if self._current is None or self._current[0] != "delete":
            raise RuntimeError(".family() only valid in a delete() chain")
        key = self._current[1]
        fam = self.table.resolve_column(ref)
        self.delete_rows.discard(key)
        self.delete_families.setdefault(key, set()).add(fam.name)
        return self

    def values(self, ref, qualifiers):
        """DeleteOp.values (DeleteOp.scala:33-39)."""
        if self._current is None or self._current[0] != "delete":
            raise RuntimeError(".values() only valid in a delete() chain")
        key = self._current[1]
        fam = self.table.resolve_column(ref)
        self.delete_rows.discard(key)
        self.delete_values.setdefault(key, {}).setdefault(fam.name, set()).update(
            to_spark_value(q) for q in qualifiers
        )
        return self

    # -- combine (OpBase.scala:26) ----------------------------------------
    def __add__(self, other: "OpBase") -> "OpBase":
        if other.table is not self.table:
            raise ValueError("cannot combine op chains from different tables")
        out = OpBase(self.table)
        for src in (self, other):
            for k, ops in src.puts.items():
                dst = out.puts.setdefault(k, _RowOps())
                dst.cells.update(ops.cells)
                for f, m in ops.map_cells.items():
                    dst.map_cells.setdefault(f, {}).update(m)
            for k, ops in src.increments.items():
                dst = out.increments.setdefault(k, _RowOps())
                for q, (v, ts) in ops.cells.items():
                    old = dst.cells.get(q, (0, None))[0] or 0
                    dst.cells[q] = (old + v, ts)
                for f, m in ops.map_cells.items():
                    dm = dst.map_cells.setdefault(f, {})
                    for mk, (v, ts) in m.items():
                        old = dm.get(mk, (0, None))[0] or 0
                        dm[mk] = (old + v, ts)
            out.delete_rows |= src.delete_rows
            for k, fams in src.delete_families.items():
                out.delete_families.setdefault(k, set()).update(fams)
            for k, fq in src.delete_values.items():
                d = out.delete_values.setdefault(k, {})
                for f, qs in fq.items():
                    d.setdefault(f, set()).update(qs)
            out._put_count += src._put_count
            for k, c in src._put_calls.items():
                out._put_calls[k] = out._put_calls.get(k, 0) + c
            out._delete_count += src._delete_count
            out._increment_count += src._increment_count
        return out

    # -- batch DataFrame construction --------------------------------------
    def _batch_df(self, spark: SparkSession, staged: dict[Any, _RowOps], default_ts) -> DataFrame:
        """Render staged cells as a DataFrame with the table schema."""
        schema = self.table.spark_schema()
        rows = []
        for key, ops in staged.items():
            d: dict[str, Any] = {f.name: None for f in schema.fields}
            d["rowkey"] = to_spark_value(key)
            ts_by_family: dict[str, dict] = {}
            for q, (v, ts) in ops.cells.items():
                d[q] = v
                col = self.table._columns[q]
                ts_by_family.setdefault(col.family.name, {})[q] = ts or default_ts
            for fname, cells in ops.map_cells.items():
                d[fname] = {k: v for k, (v, ts) in cells.items()}
                ts_by_family.setdefault(fname, {}).update(
                    {k: (ts or default_ts) for k, (v, ts) in cells.items()}
                )
            for fname, tsm in ts_by_family.items():
                d[self.table.families[fname].ts_name] = tsm
            rows.append(tuple(d[f.name] for f in schema.fields))
        return spark.createDataFrame(rows, schema)

    # -- execute ------------------------------------------------------------
    def execute(self, spark: SparkSession | None = None, write_to_wal: bool = True) -> OpsResult:
        """Apply deletes → puts → increments (README.markdown:299), commit
        one new snapshot.  Empty batch = no-op (OpBase.scala:69-71)."""
        total_ops = self._put_count + self._delete_count + self._increment_count
        has_cells = any(o.cells or o.map_cells for o in self.puts.values()) or bool(
            self.delete_rows or self.delete_families or self.delete_values
        ) or any(o.cells or o.map_cells for o in self.increments.values())
        if total_ops == 0 or not has_cells and not (self.delete_rows or self.delete_families or self.delete_values):
            return OpsResult(0, 0, 0)
        if spark is None:
            from pyspark.sql import SparkSession as _S

            spark = _S.getActiveSession()
        default_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        schema = self.table.spark_schema()

        # Partial-rewrite fast path: on prefix-partitioned storage every
        # mutation key names its partition up front, so the merge reads
        # and rewrites ONLY the touched partitions; everything else is
        # hardlinked into the new snapshot (storage.write_partial).
        prefixes = self._touched_prefixes()
        storage = getattr(self.table, "storage", None)
        partial = (
            prefixes is not None
            and storage is not None
            and self.table.df_provider is None
            and storage.supports_partial_rewrite()
        )
        if partial:
            df = self.table.to_df(spark, key_prefixes=prefixes)
        else:
            df = self.table.to_df(spark)

        df = apply_deletes(self.table, df, self.delete_rows, self.delete_families, self.delete_values)
        # Reference parity (OpBase.scala prepareOperations !put.isEmpty
        # guard): a .put(key) chain that never set a cell is skipped
        # entirely — it must not merge as a phantom all-null row — and is
        # excluded from numPuts.
        real_puts = {k: o for k, o in self.puts.items() if o.cells or o.map_cells}
        empty_put_chains = sum(
            calls for k, calls in self._put_calls.items() if k not in real_puts
        )
        if real_puts:
            df = merge_puts(self.table, df, self._batch_df(spark, real_puts, default_ts))
        if any(o.cells or o.map_cells for o in self.increments.values()):
            df = merge_increments(self.table, df, self._batch_df(spark, self.increments, default_ts))

        out = df.select(*[f.name for f in schema.fields])
        if partial:
            storage.write_partial(out, prefixes)
        else:
            self.table.overwrite(out)
        return OpsResult(
            self._delete_count, self._put_count - empty_put_chains, self._increment_count
        )

    def _touched_prefixes(self) -> list[str] | None:
        """Distinct key prefixes this batch touches, or None when the
        storage isn't prefix-partitioned / a key isn't a string."""
        storage = getattr(self.table, "storage", None)
        n = getattr(storage, "partition_prefix_len", None) if storage else None
        if not n:
            return None
        keys = (
            set(self.puts) | set(self.increments) | set(self.delete_rows)
            | set(self.delete_families) | set(self.delete_values)
        )
        out = set()
        for k in keys:
            v = to_spark_value(k)
            if not isinstance(v, str):
                return None
            out.add(v[:n])
        return sorted(out)


# ---------------------------------------------------------------------------
# merge primitives (shared with the bulk/job write path)
# ---------------------------------------------------------------------------


def apply_deletes(table, df: DataFrame, rows: set, families: dict, values: dict) -> DataFrame:
    if rows:
        df = df.filter(~F.col("rowkey").isin(list(rows)))
    for key, fams in families.items():
        for fname in fams:
            fam = table.families[fname]
            cond = F.col("rowkey") == F.lit(to_spark_value(key))
            if fam.is_map_family:
                df = df.withColumn(fam.name, F.when(cond, F.lit(None).cast(df.schema[fam.name].dataType)).otherwise(F.col(fam.name)))
            else:
                for c in fam.columns.values():
                    df = df.withColumn(
                        c.qualifier,
                        F.when(cond, F.lit(None).cast(df.schema[c.qualifier].dataType)).otherwise(F.col(c.qualifier)),
                    )
            df = df.withColumn(
                fam.ts_name, F.when(cond, F.lit(None).cast(df.schema[fam.ts_name].dataType)).otherwise(F.col(fam.ts_name))
            )
    for key, fam_quals in values.items():
        cond = F.col("rowkey") == F.lit(to_spark_value(key))
        for fname, quals in fam_quals.items():
            fam = table.families[fname]
            qlist = list(quals)
            if fam.is_map_family:
                targets = [fam.name, fam.ts_name]
            else:
                targets = [fam.ts_name]
                for q in qlist:
                    if q in fam.columns:
                        df = df.withColumn(
                            q, F.when(cond, F.lit(None).cast(df.schema[q].dataType)).otherwise(F.col(q))
                        )
            def _drop_keys(qs):
                return lambda k, v: ~k.isin(qs)

            for t in targets:
                df = df.withColumn(
                    t,
                    F.when(cond, F.map_filter(F.col(t), _drop_keys(qlist))).otherwise(F.col(t)),
                )
    return df


def _overlay_maps(old: F.Column, new: F.Column) -> F.Column:
    """map_concat with new-keys-override semantics (M2)."""
    old_nn = F.coalesce(old, F.map_from_arrays(F.array(), F.array()))
    new_nn = F.coalesce(new, F.map_from_arrays(F.array(), F.array()))
    kept = F.map_filter(old_nn, lambda k, v: ~F.array_contains(F.map_keys(new_nn), k))
    return F.map_concat(kept, new_nn)


def merge_puts(table, current: DataFrame, batch: DataFrame) -> DataFrame:
    """Cell-level last-writer-wins merge (M1-M3)."""
    cur = current.alias("cur")
    new = batch.alias("new")
    joined = cur.join(new, F.col("cur.rowkey") == F.col("new.rowkey"), "full_outer")
    out_cols = [F.coalesce(F.col("cur.rowkey"), F.col("new.rowkey")).alias("rowkey")]
    for fam in table.families.values():
        if fam.is_map_family:
            out_cols.append(_overlay_maps(F.col(f"cur.{fam.name}"), F.col(f"new.{fam.name}")).alias(fam.name))
        else:
            for c in fam.columns.values():
                out_cols.append(F.coalesce(F.col(f"new.{c.qualifier}"), F.col(f"cur.{c.qualifier}")).alias(c.qualifier))
        out_cols.append(_overlay_maps(F.col(f"cur.{fam.ts_name}"), F.col(f"new.{fam.ts_name}")).alias(fam.ts_name))
    return joined.select(*out_cols)


def _is_numeric(dtype) -> bool:
    from pyspark.sql import types as T

    return isinstance(dtype, T.NumericType)


def merge_increments(table, current: DataFrame, batch: DataFrame) -> DataFrame:
    """coalesce(old,0)+delta merge (M8); commutative → batch-aggregatable.
    Only numeric cells are incrementable (HBase increments are longs,
    IncrementOp.scala:26); non-numeric columns pass through."""
    cur = current.alias("cur")
    new = batch.alias("new")
    joined = cur.join(new, F.col("cur.rowkey") == F.col("new.rowkey"), "full_outer")
    out_cols = [F.coalesce(F.col("cur.rowkey"), F.col("new.rowkey")).alias("rowkey")]
    for fam in table.families.values():
        if fam.is_map_family:
            if _is_numeric(fam.spark_fields()[0].dataType.valueType):
                oldm = F.coalesce(F.col(f"cur.{fam.name}"), F.map_from_arrays(F.array(), F.array()))
                newm = F.coalesce(F.col(f"new.{fam.name}"), F.map_from_arrays(F.array(), F.array()))
                merged = F.map_zip_with(
                    oldm, newm, lambda k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0))
                )
                out_cols.append(merged.alias(fam.name))
            else:
                out_cols.append(F.col(f"cur.{fam.name}").alias(fam.name))
        else:
            for c in fam.columns.values():
                if not _is_numeric(c.dtype):
                    out_cols.append(F.col(f"cur.{c.qualifier}").alias(c.qualifier))
                    continue
                has_delta = F.col(f"new.{c.qualifier}").isNotNull()
                out_cols.append(
                    F.when(
                        has_delta,
                        F.coalesce(F.col(f"cur.{c.qualifier}"), F.lit(0)) + F.col(f"new.{c.qualifier}"),
                    )
                    .otherwise(F.col(f"cur.{c.qualifier}"))
                    .alias(c.qualifier)
                )
        out_cols.append(_overlay_maps(F.col(f"cur.{fam.ts_name}"), F.col(f"new.{fam.ts_name}")).alias(fam.ts_name))
    return joined.select(*out_cols)


def bulk_merge_increments(
    table, batch_df: DataFrame, marker_file: "tuple[str, str] | None" = None
) -> None:
    """Bulk increment sink: merge a DataFrame of DELTAS (table schema,
    numeric cells = amounts to add, absent cells null) into the table.

    The distributed twin of the IncrementOp client DSL: same
    merge_increments primitive, but the delta relation stays a
    DataFrame end to end — no driver collect — so counter-key
    cardinality is unbounded (the merge is a full-outer join on
    rowkey, shuffle-sized by the data, not by the driver's memory).

    ``marker_file`` is forwarded to the snapshot publish (sidecar
    written before the atomic version flip) — the exactly-once
    primitive the streaming increment sink rides on."""
    from pyspark.sql import SparkSession as _S

    spark = _S.getActiveSession()
    current = table.to_df(spark)
    table.overwrite(merge_increments(table, current, batch_df), marker_file=marker_file)


def bulk_merge_put(table, batch_df: DataFrame) -> None:
    """S12-equivalent bulk sink: merge a full DataFrame of rows into the
    table (the reducer→HTableOutput path, mapreduce2.scala:592-603).
    The batch must have the table schema."""
    from pyspark.sql import SparkSession as _S

    spark = _S.getActiveSession()
    current = table.to_df(spark)
    table.overwrite(merge_puts(table, current, batch_df))


class MultiTableBatch:
    """S13 — route each mutation chain to one of N registered tables
    (HMultiTableOutput, mapreduce2.scala:575-587; table-name validation
    at :794-809).  ``on(name)`` opens/continues the per-table batch;
    ``execute()`` commits every table's batch and sums the OpsResults
    (one snapshot commit per table — same per-target atomicity as the
    reference's per-table writers)."""

    def __init__(self, *tables):
        # _table_name is the uncloberrable registered name (a user column
        # attribute may shadow .name, e.g. a declared column "name")
        self._by_name = {getattr(t, "_table_name", t.name): t for t in tables}
        self._ops: dict[str, OpBase] = {}

    def on(self, table_name: str) -> OpBase:
        if table_name not in self._by_name:
            raise KeyError(
                f"table {table_name!r} is not a registered output "
                f"(have: {sorted(self._by_name)})"
            )
        return self._ops.setdefault(table_name, OpBase(self._by_name[table_name]))

    def execute(self, spark=None) -> OpsResult:
        total = OpsResult()
        for op in self._ops.values():
            total = total + op.execute(spark)
        return total
