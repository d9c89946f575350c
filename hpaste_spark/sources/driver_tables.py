"""HTable adapters over the driver parquet fixtures.

FIXTURES.md group-B mapping: each driver table becomes an HPaste-model
table whose ``rowkey`` is the primary key rendered as a string
(``lineitem`` → ``"{l_orderkey}_{l_linenumber}"``, etc.) and whose
remaining columns are typed columns in a ``meta``-style family.  This
gives the query DSL (point get / multi-get / scan / filters) a real
substrate without copying the read-only fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hpaste_spark.schema.table import HTable, Schema

# primary-key columns per driver table (FIXTURES.md group B)
DRIVER_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def driver_htable(spark: SparkSession, sf_dir: str, name: str, schema: Schema | None = None) -> HTable:
    """Wrap one driver parquet table as an HTable (read-only df_provider)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    src_schema = spark.read.parquet(path).schema
    key_cols = DRIVER_KEYS[name]
    reg = schema if schema is not None else Schema(base_dir=None)

    table = HTable(reg, name, key_type=str, base_dir=None, df_provider=None)
    meta = table.family("meta")
    for f in src_schema.fields:
        table.column(meta, f.name, f.dataType)

    ts_type = T.MapType(T.StringType(), T.TimestampType())

    def provider(sp: SparkSession, _path=path, _keys=key_cols) -> DataFrame:
        df = sp.read.parquet(_path)
        rowkey = F.concat_ws("_", *[F.col(k).cast("string") for k in _keys])
        return df.withColumn("rowkey", rowkey).withColumn(
            "meta__ts", F.lit(None).cast(ts_type)
        )

    table.df_provider = provider
    # rowkey is derived → filters on it can't reach the parquet scan.
    # Declaring the derivation lets Query2Builder rewrite key lookups
    # into native key-column predicates (PushedFilters → row-group
    # pruning; at 100 TB this is the difference between a point get and
    # a full scan).
    table.rowkey_source_columns = key_cols
    return table
