"""hpaste_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GravityLabs/HPaste.

The reference (/root/reference, Scala/HBase/Hadoop-MR) provides a typed
schema DSL, a get/scan/filter query DSL, a mutation batch API, and an
MR job framework.  This package re-expresses every one of those
capabilities Spark-first:

- ``hpaste_spark.schema``   — Schema / HTable / ColumnFamily / Column DSL
  (reference: src/main/scala/com/gravity/hbase/schema/HbaseTable.scala)
- ``hpaste_spark.plans``    — Query2-style builder that emits DataFrame
  plans (reference: schema/Query2.scala), plus the HJob DAG layer
  (reference: mapreduce/mapreduce2.scala)
- ``hpaste_spark.operators``— mutations (Put/Delete/Increment merge-write),
  joins/windows helpers, and the LLM-pipeline operators (dedup,
  similarity search, text analysis, multimodal)
- ``hpaste_spark.sources``  — versioned Parquet storage + driver-fixture
  catalog (reference: mapreduce2.scala HTableInput/HPathInput/...)
- ``hpaste_spark.functions``— scalar/text/vector column functions (all
  JVM-side pyspark.sql.functions compositions; no row-at-a-time UDFs)
- ``hpaste_spark.streaming``— Structured Streaming mirrors of the batch
  time-window aggregations, stateful gap-sessionization
  (applyInPandasWithState) and increment-counter sinks (beyond
  reference parity)
"""

from hpaste_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
