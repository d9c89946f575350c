"""Property-based fuzz of the as-of join (operators/asof.py) against
the pandas.merge_asof model — random key/timestamp distributions,
both directions, with and without tolerance.

Right-side (key, ts) pairs are kept unique: with duplicates our
semantics (max payload struct wins) and pandas' (last input row wins)
legitimately differ; tie determinism has its own test in test_asof.
"""

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.asof import asof_join

BASE = datetime.datetime(2024, 1, 1)
KEYS = ["a", "b", "c"]


def _dt(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 120)),
    min_size=1,
    max_size=12,
)
# unique (key, ts) on the right
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 120)),
    min_size=1,
    max_size=12,
    unique=True,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=left_rows,
    right=right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tol_min=st.sampled_from([None, 0, 15, 60]),
)
def test_asof_matches_pandas_model(spark, left, right, direction, tol_min):
    ldf = spark.createDataFrame(
        [(k, _dt(m), i) for i, (k, m) in enumerate(left)],
        "k string, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, _dt(m), f"v{k}{m}") for k, m in right],
        "k string, ts timestamp, val string",
    )
    got = {
        r["lid"]: r["val_right"]
        for r in asof_join(
            ldf,
            rdf,
            on=["k"],
            ts_col="ts",
            payload_cols=["val"],
            direction=direction,
            tolerance_us=None if tol_min is None else tol_min * 60 * 1_000_000,
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, _dt(m), i) for i, (k, m) in enumerate(left)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, _dt(m), f"v{k}{m}") for k, m in right], columns=["k", "ts", "val"]
    ).sort_values("ts", kind="stable")
    exp_df = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tol_min is None else pd.Timedelta(minutes=tol_min),
    )
    expected = {
        int(r.lid): (None if pd.isna(r.val) else r.val) for r in exp_df.itertuples()
    }

    assert len(got) == len(left)  # every left row survives
    assert got == expected
