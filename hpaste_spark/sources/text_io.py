"""Text/file source-sink surface (S9/S14/S17).

Reference: HPathInput (mapreduce2.scala:559-568), HPathOutput (:608-617,
deletes existing), and the hdfs.scala line-IO utilities
(hdfs.scala:23-159: withHdfsWriter/Reader, perHdfsLine, openParts).
Spark-native: spark.read.text / df.write.text; part-file handling is
native to the reader, so openParts/perPartSequenceFileKV collapse into
a single glob read.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def read_lines(spark: SparkSession, *paths: str) -> DataFrame:
    """HPathInput / perHdfsLine: text paths → one `value` column."""
    return spark.read.text(list(paths))


def write_lines(df: DataFrame, path: str) -> None:
    """HPathOutput: overwrite semantics (reference deletes the target
    first, mapreduce2.scala:612)."""
    if len(df.columns) != 1:
        raise ValueError("write_lines expects a single string column")
    df.write.mode("overwrite").text(path)


def read_kv_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """HSequenceInput equivalent — intermediates standardize on parquet
    (SURVEY S10): binary-sequence-file K/V becomes typed columns."""
    return spark.read.parquet(*paths)


def write_kv_parquet(df: DataFrame, path: str) -> None:
    """HSequenceOutput equivalent."""
    df.write.mode("overwrite").parquet(path)


def merge_parts_to_file(parts_dir: str, out_file: str) -> None:
    """RichFileSystem.mergeToLocal analog (RichFileSystem.scala:29-35):
    concatenate part files into one local file."""
    parts = sorted(
        os.path.join(parts_dir, p)
        for p in os.listdir(parts_dir)
        if p.startswith("part-") and not p.endswith(".crc")
    )
    with open(out_file, "wb") as out:
        for p in parts:
            with open(p, "rb") as fh:
                shutil.copyfileobj(fh, out)
