from hpaste_spark.schema.types import spark_type, register_struct, YearDay, CommaSet
from hpaste_spark.schema.table import Schema, HTable, ColumnFamily, Column
from hpaste_spark.schema.row import HRow

__all__ = [
    "Schema",
    "HTable",
    "ColumnFamily",
    "Column",
    "HRow",
    "spark_type",
    "register_struct",
    "YearDay",
    "CommaSet",
]
