"""Property-based fuzz of the funnel fold and winnowing selection
against pure-python reference models — random event streams including
timestamp ties, and random token streams including repeats.
"""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.funnel import funnel_counts

BASE = datetime.datetime(2024, 1, 1)
STEPS = ["s0", "s1", "s2"]
TYPES = STEPS + ["noise"]

events_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),          # user
        st.integers(0, 30),         # minutes (ties likely)
        st.sampled_from(TYPES),
    ),
    min_size=1,
    max_size=25,
)


def _model_counts(rows):
    """Greedy-earliest strict-order fold, mirroring funnel_counts: per
    user, replay events sorted by (ts, type); stage i fires on the
    first steps[i] event strictly after the stage i-1 timestamp."""
    by_user = {}
    for u, m, tp in rows:
        by_user.setdefault(u, []).append((m, tp))
    counts = [0] * len(STEPS)
    for evs in by_user.values():
        acc = [None] * len(STEPS)
        for m, tp in sorted(evs):
            for i, s in enumerate(STEPS):
                if acc[i] is None and tp == s:
                    if i == 0 or (acc[i - 1] is not None and m > acc[i - 1]):
                        acc[i] = m
        for i in range(len(STEPS)):
            if acc[i] is not None:
                counts[i] += 1
    return counts


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_funnel_fold_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            (u, BASE + datetime.timedelta(minutes=m), tp)
            for u, m, tp in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.step: r.n_users
        for r in funnel_counts(df, STEPS).collect()
    }
    expect = _model_counts(rows)
    assert [got[i + 1] for i in range(len(STEPS))] == expect


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=30),
    w=st.sampled_from([2, 3, 4]),
)
def test_winnow_is_window_minima_of_shingle_hashes(spark, toks, w):
    """winnow_fingerprints == distinct window-minima of the exact
    shingle_hashes values (cross-checked by computing the hashes via
    Spark itself, then winnowing in python)."""
    from pyspark.sql import functions as F

    from hpaste_spark.functions.text import shingle_hashes, winnow_fingerprints

    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        shingle_hashes(F.col("text")).alias("h"),
        winnow_fingerprints(F.col("text"), 3, w).alias("fp"),
    ).first()
    h = row["h"]
    expect = sorted({min(h[i : i + w]) for i in range(len(h) - w + 1)}) if len(h) >= w else []
    assert sorted(row["fp"]) == expect
