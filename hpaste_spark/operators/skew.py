"""Skew-mitigation operators: salted two-stage aggregation and a
replicated salted join.

Why this module exists at 100 TB: a ``groupBy``/``join`` shuffles on
its key, so one hot key ("the" after tokenization, a null customer id,
a viral document cluster) lands an entire reducer's worth of data on a
single task — the stage is as slow as its worst key no matter how many
executors exist.  Spark's own answers cover part of the space (AQE
splits skewed sort-merge-join partitions; partial aggregation thins
hot groups map-side), but two cases remain where explicit salting is
the standard fix:

- **High-cardinality agg states under a hot key** (e.g. collect-style
  or distinct-ish states where map-side combine can't thin the hot
  group): spread each key over ``n_salts`` sub-groups, merge exactly.
- **Skewed shuffle join where neither side broadcasts**: replicate the
  small side ``n_salts`` times, scatter the big side across replicas —
  each matching pair still meets exactly once, on a key that now fans
  out over ``n_salts`` reducers.

Determinism contract (matters for the oracle hash): the salt is NEVER
``rand()`` — it is ``pmod(xxhash64(salt_from), n_salts)`` of a caller
-named column, so the same row always gets the same salt and results
are bit-stable across runs.  Salting is a pure re-association of a
commutative merge, so outputs equal the unsalted plan exactly.

Reference parity note: the reference's MR layer exposes only a reducer
count (mapreduce2.scala:140 ReducerCountConf) and its hash partitioner
sends each key to one reducer — a hot key serializes there too, with
no mitigation offered; this module is the piece a distributed engine
must add that the reference never had.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

#: mergeable aggregate kinds: (stage-1 partial fn, stage-2 merge fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    salt_from: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Exact groupBy over ``keys`` computed as TWO shuffles, the first
    on ``(keys, salt)`` — no single reducer ever sees more than
    ~1/n_salts of a hot key's rows.

    ``aggs`` maps output column name -> (kind, input column) where kind
    is one of sum/count/min/max — the algebraic (mergeable) aggregates
    for which salt-partial + merge is exactly the unsalted result.
    Stage 2's input is at most ``|groups| * n_salts`` rows, so the
    second shuffle is trivially small.
    """
    unknown = {k for k, (kind, _) in aggs.items() if kind not in _MERGEABLE}
    if unknown:
        raise ValueError(f"non-mergeable aggregate kinds for: {sorted(unknown)}")
    salt_src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[_MERGEABLE[kind][0](col).alias(name) for name, (kind, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGEABLE[kind][1](name).alias(name) for name, (kind, _) in aggs.items()]
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective shuffle key: the
    ``top_n`` heaviest values of ``key_col`` with row count, corpus
    fraction, and skew ratio (count / mean-per-key) — the measurement
    you take BEFORE deciding between a plain shuffle, a broadcast, or
    :func:`salted_groupby` / :func:`salted_join` (skew ≫ 1 on the head
    key means one reducer inherits that multiple of the average load).

    Shape: one hash-agg to per-key counts (map-side combined), a
    broadcast single-row (total, n_keys) summary, and the head taken
    with ``orderBy().limit()`` — TakeOrderedAndProject, a distributed
    per-partition top-k merge; the unbounded key table is never
    single-partitioned or globally sorted.  Ties at the boundary break
    on the key value so the report is engine-stable.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    summary = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    head = counts.orderBy(F.col("cnt").desc(), F.col(key_col)).limit(top_n)
    return head.crossJoin(F.broadcast(summary)).select(
        key_col,
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), 6).alias("frac"),
        F.round(
            F.col("cnt").cast("double") * F.col("_nkeys") / F.col("_total"), 4
        ).alias("skew"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str | Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``small`` is replicated ``n_salts``
    times (one replica per salt value), ``big`` is scattered across the
    replicas by a deterministic row salt, and the join key becomes
    ``(on, salt)`` — a hot key's rows now spread over ``n_salts``
    shuffle partitions instead of one.

    Each (big row, small row) matching pair meets exactly once — the
    big row carries exactly one salt and exactly one replica of the
    small row has that salt — so the result multiset equals the plain
    join for ``inner`` and ``left`` (big-side-preserving) joins; other
    join types would see replica phantoms and are rejected.

    ``salt_from`` must be FINER-grained than the join key (a row id, or
    a struct of (key, line_number)) — salting by the key itself maps a
    hot key's rows to one salt and spreads nothing.

    Use when the small side is too big to broadcast AND AQE's skew
    split can't help (e.g. the hot key sits in one un-splittable
    aggregation input).  Cost: ``n_salts``× duplication of the small
    side — size it as hot-key-width / target-partition-width.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves only big-side join semantics: inner/left")
    salt_src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    b = big.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, [on, _SALT], how).drop(_SALT)
