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

    Two exact paths:

    - column-NAME input (a raw 2-decimal money column): sum integer
      cents in ``long`` — a primitive whole-stage-codegen hash-agg
      buffer instead of a decimal(22,2) one (the round-2 a1 regression
      was decimal aggregation cost, VERDICT r2 #5).  The input is exact
      at 2 decimals so ROUND at scale 2 is the identity, and
      ``long / 100.0`` is the correctly-rounded nearest double of the
      exact sum — the same double the decimal path produces.  Headroom:
      ~9.2e18 cents ≈ 9e16 dollars per group, far past any 100 TB
      corpus total.
    - Column input (already-exact decimal products, e.g. price×(1-disc)
      at scale 4–6): exact decimal sum as before — these need the
      38-digit widening at extreme scale, and products are a minority
      of the aggregates.
    """
    if isinstance(expr, str) and scale == 2:
        u = f"cast(round(({expr}) * 100) as long)"
        return F.expr(f"sum({u})").cast("double") / F.lit(100.0)
    e = money(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(e), scale).cast("double")


def davg(expr: str | Column, scale: int = 2) -> Column:
    """Deterministic ``ROUND(AVG(money), scale)`` as double.

    Column-name inputs at scale 2 use the same exact integer-cents
    two-stage half-up division as the DuckDB oracle twin
    (:func:`sql_avg2`): micro = half_up(cents*10^4 / n) — Spark's
    decimal(16,6) average — then cents' = half_up(micro / 10^4) —
    ``F.round(.., 2)``.  Pure long arithmetic (``div``), so the fold is
    order-independent and a primitive codegen buffer; valid for the
    non-negative money columns used here (``div`` truncation == floor
    for non-negative operands, matching DuckDB ``//``).

    Column inputs keep Spark's exact decimal average: divides the exact
    sum half-up at scale+4 (``decimal(16,6)`` for a (12,2) input), then
    :func:`F.round` applies half-up again at ``scale``.
    """
    if isinstance(expr, str) and scale == 2:
        # widen the cent sum to decimal(38,0) before the *2*10^4 blowup:
        # in pure long, 2*s*10000 wraps once a group's cent sum passes
        # ~4.6e14 (~$4.6T) — silently wrong averages at 100 TB.  The
        # fold itself still runs on a primitive long buffer; only the
        # once-per-group division pays the decimal cost.  Headroom is
        # now ~5e33 cents per group (decimal38 / 2e4).
        s = f"cast(sum(cast(round(({expr}) * 100) as long)) as decimal(38,0))"
        c = f"count({expr})"
        # nullif: a group with zero non-null values must yield NULL (like
        # AVG), not an ANSI divide-by-zero error
        micro = f"((2*({s})*10000 + {c}) div nullif(2*({c}), 0))"
        cents = f"((2*{micro} + 10000) div 20000)"
        return F.expr(f"({cents})").cast("double") / F.lit(100.0)
    e = money(expr) if isinstance(expr, str) else expr
    return F.round(F.avg(e), scale).cast("double")


def sql_cents(col: str) -> str:
    """Long integer cents of a 2-decimal money column (Spark SQL text)."""
    return f"cast(round(({col}) * 100) as long)"


def dsum_units(units_sql: str, in_scale: int, scale: int = 2) -> Column:
    """Exact ``ROUND(SUM(units · 10^-in_scale), scale)`` as double, where
    ``units_sql`` is a Spark-SQL expression producing integer units at
    ``in_scale`` decimals (e.g. cents·percent·percent for
    price×(1-disc)×(1+tax) at scale 6) — all per-row math in long.

    The aggregation buffer stays primitive via a split sum: per row the
    units are divided into ``hi = units div 10^6`` and ``lo = units %
    10^6`` and summed as two longs (whole-stage codegen, no decimal
    buffer); the exact total ``hi·10^6 + lo`` is recombined ONCE per
    group in decimal(38,0), so group totals far beyond the long range
    stay exact — the same headroom as a decimal sum at a fraction of
    the cost.  Final half-up round to ``scale`` is integer math,
    matching DuckDB's ``ROUND(DECIMAL)``; valid for non-negative sums
    (all money aggregates here).
    """
    total = _units_total_sql(units_sql)
    d = 10 ** (in_scale - scale)
    rounded = f"((2*{total} + {d}) div {2 * d})" if d > 1 else total
    return F.expr(rounded).cast("double") / F.lit(float(10**scale))


def _units_total_sql(units_sql: str) -> str:
    m = 10**6
    hi = f"sum(({units_sql}) div {m})"
    lo = f"sum(({units_sql}) % {m})"
    return f"(cast({hi} as decimal(38,0)) * {m} + {lo})"


def dsum_units_total(units_sql: str) -> Column:
    """The exact decimal(38,0) unit total of :func:`dsum_units`'s split
    sum, un-rounded — use as an ORDER BY / comparison key when ranking
    must follow the full-precision sum rather than the rounded output."""
    return F.expr(_units_total_sql(units_sql))


def dsum_disc(ext_col: str = "l_extendedprice", disc_col: str = "l_discount", scale: int = 2) -> Column:
    """Exact ``ROUND(SUM(ext·(1-disc)), scale)`` as double — the
    TPC-H revenue aggregate — on the integer-unit fast path:
    cents·percent at scale 4, split-summed in long (:func:`dsum_units`).
    Bit-identical to the decimal form the oracle computes."""
    e, d = sql_cents(ext_col), sql_cents(disc_col)
    return dsum_units(f"({e}) * (100 - {d})", 4, scale)


def dsum_mul(ext_col: str = "l_extendedprice", frac_col: str = "l_discount", scale: int = 2) -> Column:
    """Exact ``ROUND(SUM(ext·frac), scale)`` as double (e.g. Q6's
    revenue = price × discount) via the same integer-unit path."""
    e, d = sql_cents(ext_col), sql_cents(frac_col)
    return dsum_units(f"({e}) * ({d})", 4, scale)


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
