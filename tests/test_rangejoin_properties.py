"""Property-based fuzz of the bucketed range join against a
brute-force model: for every (point, interval) pair with equal keys,
the pair appears in the output iff start <= ts <= end — regardless of
bucket width (the bucket rewrite must be exact, never approximate).
"""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.rangejoin import range_join

BASE = datetime.datetime(2024, 1, 1)
KEYS = ["a", "b"]
MIN_US = 60 * 1_000_000


def _dt(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


points_st = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 200)), min_size=1, max_size=10
)
intervals_st = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 200), st.integers(0, 120)),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=points_st,
    intervals=intervals_st,
    bucket_min=st.sampled_from([1, 7, 60, 500]),
    how=st.sampled_from(["inner", "left"]),
)
def test_rangejoin_matches_bruteforce(spark, points, intervals, bucket_min, how):
    pdf = spark.createDataFrame(
        [(k, _dt(m), i) for i, (k, m) in enumerate(points)],
        "k string, ts timestamp, pid long",
    )
    idf = spark.createDataFrame(
        [(k, _dt(s), _dt(s + w), j) for j, (k, s, w) in enumerate(intervals)],
        "k string, w_start timestamp, w_end timestamp, iid long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, on=["k"], ts_col="ts", start_col="w_start", end_col="w_end",
            bucket_us=bucket_min * MIN_US, how=how,
        ).collect()
    )

    matched = sorted(
        (i, j)
        for i, (pk, pm) in enumerate(points)
        for j, (ik, s, w) in enumerate(intervals)
        if pk == ik and s <= pm <= s + w
    )
    if how == "inner":
        assert got == matched
    else:
        matched_pids = {i for i, _ in matched}
        loners = sorted((i, None) for i in range(len(points)) if i not in matched_pids)
        assert got == sorted(matched + loners)
