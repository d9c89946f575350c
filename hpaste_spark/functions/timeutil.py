"""Timestamp-dtype-safe epoch helpers.

The driver fixtures have shipped ``ts`` as three different physical
types across rounds (nanos-as-long, TIMESTAMP, TIMESTAMP_NTZ).  The
catalog normalizes at load time, but operators also take arbitrary
caller DataFrames, so epoch math must not assume a dtype:
``F.unix_micros`` raises DATATYPE_MISMATCH on TIMESTAMP_NTZ input.

``epoch_us`` inserts a cast to TIMESTAMP first.  On a TIMESTAMP column
the cast is an identity the optimizer drops; on TIMESTAMP_NTZ it is a
pure type change with identical values because the session timezone is
pinned UTC (session.py) — so one expression is safe for both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(c: Column | str) -> Column:
    """Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))
