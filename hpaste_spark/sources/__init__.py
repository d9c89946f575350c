from hpaste_spark.sources.catalog import DRIVER_TABLES, load_table, load_tables
from hpaste_spark.sources.storage import ParquetStorage

__all__ = ["DRIVER_TABLES", "load_table", "load_tables", "ParquetStorage"]
