"""Vector column functions over ARRAY<FLOAT|DOUBLE> embeddings.

All built from ``zip_with``/``aggregate`` so the arithmetic runs
JVM-side inside codegen; element order is the array order, so results
are bit-reproducible against the DuckDB oracle (both engines fold
left-to-right in double precision after an explicit element cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    # array-level Cast, not transform(x -> cast): identical element-wise
    # semantics (same per-element Cast, same order, same null handling —
    # A/B hash-verified), but Cast is codegen while ArrayTransform is
    # interpreted, and the optimizer REMOVES the cast entirely when the
    # input is already array<double> (the pre-cast `_e` columns every
    # monitor/grader feeds back through dot/cosine), where transform
    # always rebuilt the array per row.
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with every subtree evaluated ONCE (r13):
    written naively as ``when(norm·norm == 0, 0, dot/(norm·norm))``
    the two norm folds run twice (once in the zero test, once in the
    division) and each ``as_double`` array cast re-runs per fold
    reference — 5 interpreted 64-element folds + 10 array casts per
    call.  HOF expression trees get no subexpression elimination, so
    the casts and the three fold sums are bound through
    ``functions.text.bind1`` instead: 3 folds + 2 casts, identical
    arithmetic in the identical fold order (bit-reproducible vs the
    oracle, unchanged)."""
    from .text import bind1

    def _sums(s: Column) -> Column:
        return F.struct(
            F.aggregate(
                F.zip_with(s["a"], s["b"], lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dab"),
            F.aggregate(
                F.zip_with(s["a"], s["a"], lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("na2"),
            F.aggregate(
                F.zip_with(s["b"], s["b"], lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("nb2"),
        )

    def _cos(t: Column) -> Column:
        d = F.sqrt(t["na2"]) * F.sqrt(t["nb2"])
        return F.when(d == 0, F.lit(0.0)).otherwise(t["dab"] / d)

    return bind1(
        bind1(
            F.struct(as_double(a).alias("a"), as_double(b).alias("b")), _sums
        ),
        _cos,
    )


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization: struct(scale, q) with
    ``q[i] = round(x[i] / scale)`` for ``scale = max|x| / 127`` — the
    storage-compression step for embedding columns at corpus scale
    (4 bytes/dim float → 1 byte/dim, recall loss well under ANN noise).
    Scale is rounded to 9 dp BEFORE quantizing so both engines divide by
    the identical double and the int codes match exactly.  All-zero
    vectors get scale 0 and all-zero codes (no divide-by-zero)."""
    v = as_double(vec)
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.round(amax / F.lit(127.0), 9)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("long"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize(qstruct: Column) -> Column:
    """Approximate reconstruction: ``q[i] * scale`` (double array)."""
    return F.transform(qstruct["q"], lambda c: c.cast("double") * qstruct["scale"])
