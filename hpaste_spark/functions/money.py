"""Exact-decimal money aggregation — the determinism contract for sums
and averages over 2-decimal "money" columns.

Why this exists: ``SUM(double)`` in Spark folds partials in partition
arrival order, so the last few ulps of the result change run to run.
``ROUND(that, 2)`` then lands on a ``.xx5`` boundary differently per
run — a coin-flip 0.01 divergence (observed on ``a_conditional_agg``
in round 1).  Money columns in the fixtures (and in TPC-H generally)
are exact at 2 decimal places, so casting them to ``DECIMAL`` before
aggregating makes the whole fold exact integer arithmetic: associative,
commutative, order-independent — deterministic on any cluster layout,
and bit-identical between Spark and any exact-decimal oracle.

Scale note: this is free at 100 TB.  Decimal sum/avg still get
map-side partial aggregation (Sum/Average are DeclarativeAggregates
over decimals too) and stay inside whole-stage codegen; a
``decimal(12,2)`` holds 10^10 cents per value and the sum type widens
to 38 digits, enough for ~10^26 cents.

The oracle side (DuckDB) degrades ``AVG(DECIMAL)`` to DOUBLE, so
:func:`sql_avg2` replicates Spark's exact two-stage decimal average
(divide half-up at scale 6, then round half-up at scale 2) using
integer-cents arithmetic — bit-exact for non-negative sums, which is
what every emitted money average here is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough for any single money value in the fixtures (10^10 cents) while
#: keeping a triple product (12,2)*(12,2)*(12,2) within DuckDB's 38-digit cap
MONEY_T = "decimal(12,2)"


def money(col: str | Column) -> Column:
    """Cast a 2-decimal money column to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY_T)


def dsum(expr: str | Column, scale: int = 2) -> Column:
    """Deterministic ``ROUND(SUM(money), scale)`` as double.

    The sum happens in exact decimal (order-independent), the round is
    decimal half-up, and only the final value is lowered to double —
    the nearest double to an exact decimal is unique, so the output is
    identical across runs, partitionings, and engines.
    """
    e = money(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(e), scale).cast("double")


def davg(expr: str | Column, scale: int = 2) -> Column:
    """Deterministic ``ROUND(AVG(money), scale)`` as double.

    Spark's decimal average divides the exact sum half-up at scale+4
    (``decimal(16,6)`` for a (12,2) input), then :func:`F.round` applies
    half-up again at ``scale``.  Mirror with :func:`sql_avg2`.
    """
    e = money(expr) if isinstance(expr, str) else expr
    return F.round(F.avg(e), scale).cast("double")


def sql_money(col: str) -> str:
    """Oracle twin of :func:`money` (DuckDB ``::`` cast)."""
    return f"{col}::DECIMAL(12,2)"


def sql_sum2(expr: str, scale: int = 2) -> str:
    """Oracle twin of :func:`dsum`: exact decimal sum, decimal round,
    final cast to double.  ``expr`` must already be decimal-typed
    (wrap raw columns with :func:`sql_money`)."""
    return f"ROUND(SUM({expr}), {scale})::DOUBLE"


def sql_avg2(col_expr: str) -> str:
    """Oracle twin of :func:`davg` at scale 2 for NON-NEGATIVE money.

    DuckDB's ``AVG(DECIMAL)`` returns DOUBLE (inexact), so replicate
    Spark's exact path in integer cents: with s = exact cent sum and
    c = non-null count,
      micro = half_up(s*10^4 / c)        -- Spark's decimal(16,6) avg
      cents = half_up(micro / 10^4)      -- Spark's F.round(.., 2)
    ``//`` truncation == floor for the non-negative numerators used
    here; empty groups give c=0 and ``x // 0`` is NULL in DuckDB,
    matching Spark's NULL average.  ``col_expr`` is the raw (double)
    column or CASE expression, exact at 2 decimals.
    """
    s = f"SUM(CAST(ROUND(({col_expr})*100) AS BIGINT))"
    c = f"COUNT({col_expr})"
    micro = f"((2*({s})*10000 + {c}) // (2*({c})))"
    cents = f"((2*{micro} + 10000) // 20000)"
    return f"({cents} / 100.0)"
