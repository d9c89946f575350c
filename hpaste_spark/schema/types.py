"""Type registry: HPaste ByteConverter types → Spark SQL types.

The reference serializes every value through an implicit
``ByteConverter[T]`` (Serialization.scala:155-217) with built-ins for
primitives, joda dates, ``YearDay``, ``CommaSet``, ``Seq/Set/Map`` and
user ``ComplexByteConverter`` structs (schema.scala:53-198).  On Spark
the byte codecs disappear — parquet/Arrow own the encoding — so the
registry's only job is the *type mapping* (SURVEY §1.3) plus Python-side
struct registration for custom classes (the ``Kitten`` pattern,
ExampleSchema.scala:36,58-68).
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
from typing import Any

from pyspark.sql import types as T

# name/alias → Spark type (reference file:line of the ByteConverter)
_PRIMITIVES: dict[Any, T.DataType] = {
    str: T.StringType(),  # schema.scala:59
    "string": T.StringType(),
    int: T.LongType(),  # schema.scala:102 (Long is the common numeric)
    "long": T.LongType(),
    "int": T.IntegerType(),  # schema.scala:70
    "short": T.ShortType(),  # schema.scala:80
    bool: T.BooleanType(),  # schema.scala:90
    "boolean": T.BooleanType(),
    float: T.DoubleType(),  # schema.scala:112
    "double": T.DoubleType(),
    "float": T.FloatType(),  # schema.scala:123
    _dt.datetime: T.TimestampType(),  # DateTime, schema.scala:176
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    _dt.date: T.DateType(),  # DateMidnight, schema.scala:165
    "date": T.DateType(),
    bytes: T.BinaryType(),
    "binary": T.BinaryType(),
}

# Registered custom struct classes (ComplexByteConverter analog).
_STRUCTS: dict[type, T.StructType] = {}


@dataclasses.dataclass(frozen=True)
class YearDay:
    """Reference: case class YearDay(year, day), Schema.scala:258;
    string-encoded converter schema.scala:147."""

    year: int
    day: int


@dataclasses.dataclass(frozen=True)
class CommaSet:
    """Reference: CommaSet(Set[String]) CSV-encoded, Schema.scala:260-272,
    schema.scala:134.  Spark-side: ARRAY<STRING> with set semantics."""

    items: frozenset

    def __init__(self, items):
        object.__setattr__(self, "items", frozenset(items))


def register_struct(cls: type, schema: T.StructType | None = None) -> type:
    """Register a Python dataclass as a Spark StructType (the
    ComplexByteConverter extension point, Serialization.scala:183-217)."""
    if schema is None:
        if not dataclasses.is_dataclass(cls):
            raise TypeError(f"{cls} must be a dataclass or supply an explicit schema")
        import typing

        hints = typing.get_type_hints(cls)  # resolves string annotations
        fields = [
            T.StructField(f.name, spark_type(hints.get(f.name, f.type)))
            for f in dataclasses.fields(cls)
        ]
        schema = T.StructType(fields)
    _STRUCTS[cls] = schema
    return cls


# YearDay → STRUCT<year INT, day INT> (SURVEY §1.3)
register_struct(
    YearDay, T.StructType([T.StructField("year", T.IntegerType()), T.StructField("day", T.IntegerType())])
)


def spark_type(t: Any) -> T.DataType:
    """Resolve an HPaste-style type spec to a Spark DataType.

    Accepts: python primitives, string aliases, DataType instances,
    registered struct classes, and ``list[x]`` / ``dict[k, v]`` specs
    (the Seq/Set/Map converters, Serialization.scala:261-340).
    """
    if isinstance(t, T.DataType):
        return t
    if isinstance(t, type) and t in _STRUCTS:
        return _STRUCTS[t]
    if t is CommaSet or t == "commaset":
        return T.ArrayType(T.StringType())
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    if isinstance(t, str) and t.lower() in _PRIMITIVES:
        return _PRIMITIVES[t.lower()]
    # list[x] / set[x] → ArrayType, dict[k,v] → MapType
    origin = getattr(t, "__origin__", None)
    args = getattr(t, "__args__", ())
    if origin in (list, set, frozenset) and args:
        return T.ArrayType(spark_type(args[0]))
    if origin is dict and len(args) == 2:
        return T.MapType(spark_type(args[0]), spark_type(args[1]))
    if isinstance(t, str):
        # last resort: DDL string ("array<string>", "map<string,bigint>", ...)
        return T._parse_datatype_string(t)
    raise TypeError(f"no Spark type mapping for {t!r}")


def to_spark_value(v: Any) -> Any:
    """Convert registry values (YearDay, CommaSet, dataclasses) to plain
    Python shapes Spark's Row conversion accepts."""
    if isinstance(v, CommaSet):
        return sorted(v.items)
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return tuple(to_spark_value(getattr(v, f.name)) for f in dataclasses.fields(v))
    if isinstance(v, dict):
        return {to_spark_value(k): to_spark_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [to_spark_value(x) for x in v]
    if isinstance(v, (set, frozenset)):
        return sorted(to_spark_value(x) for x in v)
    return v
