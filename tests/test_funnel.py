"""funnel_counts / cohort_retention unit semantics.

Hand-built event histories where the strict-order rules matter:
out-of-order steps don't count, same-timestamp events don't chain,
and retention cells divide by the cohort's offset-0 size.
"""

import datetime as dt

import pytest
from pyspark.sql import Row

from hpaste_spark.operators.funnel import cohort_retention, funnel_counts

T0 = dt.datetime(2024, 1, 1)


def _ev(uid, minutes, tp):
    return Row(user_id=uid, ts=T0 + dt.timedelta(minutes=minutes), event_type=tp)


def test_funnel_strict_order_and_counts(spark):
    rows = [
        # u1 completes the whole funnel in order
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 9, "purchase"),
        # u2 clicks BEFORE viewing: click must not count (purchase neither)
        _ev(2, 0, "click"), _ev(2, 5, "view"), _ev(2, 6, "purchase"),
        # u3 views only
        _ev(3, 1, "view"),
        # u4 same-timestamp view+click: strict > means click doesn't chain
        _ev(4, 2, "view"), _ev(4, 2, "click"),
        # u5 never enters the funnel
        _ev(5, 3, "error"),
    ]
    out = funnel_counts(
        spark.createDataFrame(rows), ["view", "click", "purchase"]
    ).orderBy("step").collect()
    assert [(r.step, r.step_name, r.n_users) for r in out] == [
        (1, "view", 4),
        (2, "click", 1),
        (3, "purchase", 1),
    ]
    assert out[0].pct_of_first == 100.0
    assert out[1].pct_of_first == 25.0


def test_funnel_second_chance_after_first_stage(spark):
    # view @0, click @-5 (ignored), click @3 -> counts
    rows = [_ev(1, 0, "view"), _ev(1, -5, "click"), _ev(1, 3, "click")]
    out = funnel_counts(spark.createDataFrame(rows), ["view", "click"]).collect()
    by = {r.step_name: r.n_users for r in out}
    assert by == {"view": 1, "click": 1}


def test_funnel_rejects_bad_steps(spark):
    df = spark.createDataFrame([_ev(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel_counts(df, ["view"])
    with pytest.raises(ValueError):
        funnel_counts(df, ["view", "view"])


def test_cohort_retention_cells(spark):
    day = 86_400
    rows = [
        # u1 first in period 0, active periods 0 and 1
        _ev(1, 0, "view"), _ev(1, (8 * day) // 60, "view"),
        # u2 first in period 0, active period 0 only
        _ev(2, day // 60, "view"),
        # u3 first in period 1
        _ev(3, (8 * day) // 60, "view"),
    ]
    out = cohort_retention(
        spark.createDataFrame(rows), period_days=7
    ).orderBy("cohort_period", "period_offset").collect()
    cells = {(r.cohort_period, r.period_offset): (r.n_active, r.retention_pct) for r in out}
    # period index is absolute epoch weeks; relative offsets are what we assert
    (c0, _off0) = min(cells)[0], 0
    assert cells[(c0, 0)] == (2, 100.0)
    assert cells[(c0, 1)] == (1, 50.0)
    assert cells[(c0 + 1, 0)] == (1, 100.0)
    assert len(cells) == 3


def test_event_transitions_counts(spark):
    rows = [
        _ev(1, 0, "view"), _ev(1, 1, "click"), _ev(1, 2, "view"),
        _ev(2, 0, "view"), _ev(2, 1, "click"),
        _ev(3, 5, "error"),  # single event: no transition
    ]
    from hpaste_spark.operators.funnel import event_transitions

    out = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(spark.createDataFrame(rows)).collect()
    }
    assert out == {("view", "click"): 2, ("click", "view"): 1}


def test_weighted_sample_weight_bias_and_determinism(spark):
    """Heavier rows must be picked more often; identical seeds give
    identical samples; rank is contiguous 1..k."""
    from hpaste_spark.operators.sampling import weighted_sample

    import hashlib
    import math

    rows = [(i, "g", 1000.0 if i < 10 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = weighted_sample(df, k=10, weight_col="w", id_col="id", group_col="g").collect()
    assert sorted(r.sample_rank for r in got) == list(range(1, 11))

    # exact A-ES contract: reproduce the md5 keys in pure python
    def key(i, w):
        u = (int(hashlib.md5(f"ws1{i}".encode()).hexdigest()[:13], 16) + 1.0) / (1 << 52)
        return -math.log(u) / w

    expect = {r[0] for r in sorted(rows, key=lambda r: (key(r[0], r[2]), r[0]))[:10]}
    assert {r.id for r in got} == expect
    heavy = sum(1 for r in got if r.id < 10)
    assert heavy >= 5, f"weighted pick must far exceed the uniform E=0.1, got {heavy}"
    again = weighted_sample(df, k=10, weight_col="w", id_col="id", group_col="g").collect()
    assert sorted(r.id for r in got) == sorted(r.id for r in again)
    # global (no-group) path: top-k without a global sort
    gl = weighted_sample(df, k=5, weight_col="w", id_col="id").collect()
    assert sorted(r.sample_rank for r in gl) == [1, 2, 3, 4, 5]


def test_time_to_conversion_buckets(spark):
    rows = [
        # u1: view @0, purchase @2h -> bucket 0 (within first 24h)
        _ev(1, 0, "view"), _ev(1, 120, "purchase"),
        # u2: view @0, purchases @26h and @50h -> first wins, bucket 1
        _ev(2, 0, "view"), _ev(2, 26 * 60, "purchase"), _ev(2, 50 * 60, "purchase"),
        # u3: purchase BEFORE view only -> never converts
        _ev(3, 0, "purchase"), _ev(3, 60, "view"),
        # u4: view only
        _ev(4, 0, "view"),
    ]
    from hpaste_spark.operators.funnel import time_to_conversion

    out = {
        r.bucket: r.n_users
        for r in time_to_conversion(
            spark.createDataFrame(rows), "view", "purchase", bucket_hours=24
        ).collect()
    }
    assert out == {0: 1, 1: 1}


def test_basket_lift_hand_computed(spark):
    """4 baskets: {a,b} together twice of 4 baskets; a in 3, b in 2.
    support(a,b)=0.5, lift = 0.5/(0.75*0.5) = 1.333333."""
    from hpaste_spark.operators.basket import cooccurrence_lift

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"), (4, "c"),  # duplicate item rows collapse
    ]
    df = spark.createDataFrame(rows, "o long, i string")
    out = {
        (r.item_a, r.item_b): (r.n_pairs, r.support, r.lift)
        for r in cooccurrence_lift(df, "o", "i", min_pairs=2).collect()
    }
    assert out == {("a", "b"): (2, 0.5, 1.333333)}
    # min_pairs=1 surfaces the single {a,c} co-occurrence too
    out1 = {
        (r.item_a, r.item_b)
        for r in cooccurrence_lift(df, "o", "i", min_pairs=1).collect()
    }
    assert out1 == {("a", "b"), ("a", "c")}


def test_basket_max_basket_caps_quadratic(spark):
    from hpaste_spark.operators.basket import cooccurrence_lift

    rows = [(1, f"i{k}") for k in range(50)] + [(2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "o long, i string")
    out = cooccurrence_lift(df, "o", "i", min_pairs=1, max_basket=10).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("x", "y")}, \
        "the 50-item degenerate basket must be dropped before pair expansion"
