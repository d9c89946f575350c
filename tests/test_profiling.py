"""Temperature mixing, table profiling, and skew diagnostics —
semantic + plan-shape checks on the driver fixtures at sf0.001."""

import pytest
from pyspark.sql import functions as F

from hpaste_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


# ---------------------------------------------------------------- mixture


def test_temperature_flattens_toward_uniform(spark, docs):
    """tau=0.5 must downweight the head language relative to the tail:
    the kept-fraction of the largest stratum is strictly below that of
    the smallest (that is the whole point of temperature resampling)."""
    from hpaste_spark.operators.sampling import temperature_mixture

    base = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = temperature_mixture(docs, "lang", "doc_id", tau=0.5, target_frac=0.5)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    head = max(base, key=base.get)
    tail = min(base, key=base.get)
    assert got[head] / base[head] < got[tail] / base[tail]
    # tail strata whose rate clamps at 1 are kept whole
    total = sum(base.values())
    wsum = sum(int((n ** 0.5) * (1 << 20)) for n in base.values())
    for lang, n in base.items():
        rate = min(1.0, 0.5 * total * int((n ** 0.5) * (1 << 20)) / (n * wsum))
        if rate == 1.0:
            assert got.get(lang, 0) == n


def test_temperature_tau1_is_uniform_downsampling(spark, docs):
    """tau=1 collapses to plain proportional sampling: every stratum's
    keep threshold is the same target_frac bucket cut."""
    from hpaste_spark.operators.sampling import hash_bucket, temperature_mixture

    kept = temperature_mixture(docs, "lang", "doc_id", tau=1.0, target_frac=0.4)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    expect = {
        r["doc_id"]
        for r in docs.select("doc_id", hash_bucket(F.col("doc_id"), 65536).alias("b"))
        .collect()
        if r["b"] < int(0.4 * 65536)
    }
    assert ids == expect


def test_temperature_monotone_in_target_frac(spark, docs):
    """Raising target_frac only ever ADDS rows (md5-threshold keeps
    re-mixes incremental, same contract as mixture_sample)."""
    from hpaste_spark.operators.sampling import temperature_mixture

    small = {r["doc_id"] for r in
             temperature_mixture(docs, "lang", "doc_id", 0.5, 0.3).select("doc_id").collect()}
    big = {r["doc_id"] for r in
           temperature_mixture(docs, "lang", "doc_id", 0.5, 0.6).select("doc_id").collect()}
    assert small <= big
    assert len(small) < len(big)


# ---------------------------------------------------------------- profile


def test_profile_counts_nulls_distincts_and_native_extremes(spark):
    df = spark.createDataFrame(
        [(1, "b", 10.0), (2, None, 2.5), (3, "a", None), (3, "a", 2.5)],
        "k long, s string, v double",
    )
    from hpaste_spark.operators.profile import profile_table

    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["k"]["n_nulls"], rows["k"]["n_distinct"]) == (0, 3)
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["v"]["n_nulls"], rows["v"]["n_distinct"]) == (1, 2)
    # native-type extremes: numeric min is 2.5, not lexicographic "10.0"
    assert rows["v"]["min_str"] == "2.5"
    assert rows["v"]["max_str"] == "10.0"
    assert rows["k"]["min_str"] == "1"


def test_profile_all_null_column_and_approx_mode(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    from hpaste_spark.operators.profile import profile_table

    r = {x["col_name"]: x for x in profile_table(df).collect()}
    assert r["s"]["n_distinct"] == 0
    assert r["s"]["min_str"] is None and r["s"]["max_str"] is None
    approx = {x["col_name"]: x for x in profile_table(df, approx_distinct=True).collect()}
    assert approx["k"]["n_distinct"] == 2  # HLL exact at tiny cardinality


def test_profile_is_one_scan_no_join(spark, orders):
    """The profile is ONE aggregate pass: no joins, no unions of
    per-column scans — the plan reads the table once (Expand handles
    the distinct set) and the unpivot is driver-free."""
    from hpaste_spark.operators.profile import profile_table

    plan = profile_table(
        orders, ["o_orderkey", "o_orderstatus"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1


# ---------------------------------------------------------------- skew


def test_skew_report_values_and_order(spark):
    rows = [("hot", i) for i in range(60)] + [("warm", i) for i in range(30)]
    rows += [(f"k{i}", 0) for i in range(10)]  # 10 singleton keys
    df = spark.createDataFrame(rows, "key string, x long")
    from hpaste_spark.operators.skew import skew_report

    got = skew_report(df, "key", top_n=3).collect()
    assert [r["key"] for r in got] == ["hot", "warm", "k0"]  # ties break on key
    total, nkeys = 100, 12
    assert got[0]["cnt"] == 60
    assert got[0]["frac"] == round(60 / total, 6)
    assert got[0]["skew"] == round(60 * nkeys / total, 4)
    assert got[2]["cnt"] == 1


def test_skew_report_head_is_distributed_topk(spark, orders):
    """The head must plan as TakeOrderedAndProject (per-partition top-k
    merge), never a global Sort of the unbounded key table."""
    from hpaste_spark.operators.skew import skew_report

    plan = skew_report(
        orders, "o_custkey", top_n=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_equifreq_bins_counts_and_ranges(spark):
    """1..100 into deciles: 10 bins of 10, contiguous ranges."""
    from hpaste_spark.operators.profile import equifreq_bins

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = sorted(equifreq_bins(df, "x", 10).collect(), key=lambda r: r.bin)
    assert [r.bin for r in out] == list(range(1, 11))
    assert all(r.n == 10 for r in out)
    assert out[0].min_val == 1.0 and out[-1].max_val == 100.0
    # ranges don't overlap
    for a, b in zip(out, out[1:]):
        assert a.max_val < b.min_val


def test_equifreq_bins_ties_share_bin(spark):
    from hpaste_spark.operators.profile import equifreq_bins

    df = spark.createDataFrame([(1.0,)] * 50 + [(2.0,)] * 50, "x double")
    out = equifreq_bins(df, "x", 4).collect()
    # p25=1.0, p50=1.5, p75=2.0; 2.0 clears only the first two strictly
    assert sorted((r.bin, r.n) for r in out) == [(1, 50), (3, 50)]


def test_drift_psi_identical_distributions_near_zero(spark):
    from hpaste_spark.operators.profile import drift_psi

    ref = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = drift_psi(ref, ref, "x", n_bins=5).collect()
    assert len(out) == 5
    assert all(abs(r.psi_term) < 1e-9 for r in out), "same dist -> PSI ~ 0"
    assert all(r.p_ref == r.p_cur for r in out)


def test_drift_psi_detects_shift_and_vanished_bin(spark):
    from hpaste_spark.operators.profile import drift_psi

    ref = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    # current sample lives entirely in the upper half
    cur = spark.createDataFrame([(float(i),) for i in range(60, 160)], "x double")
    out = {r.bin: r for r in drift_psi(ref, cur, "x", n_bins=4).collect()}
    assert out[1].psi_term is None and out[1].n_cur == 0, \
        "a bin with no current mass must flag NULL, not a smoothed number"
    total = sum(r.psi_term for r in out.values() if r.psi_term is not None)
    assert total > 0.2, f"a gross shift must clear the 0.2 alert bar, got {total}"


def test_drift_psi_categorical_vanished_category(spark):
    from hpaste_spark.operators.profile import drift_psi_categorical

    ref = spark.createDataFrame([("en",)] * 8 + [("fr",)] * 2, "lang string")
    cur = spark.createDataFrame([("en",)] * 5 + [("de",)] * 5, "lang string")
    out = {r.category: r for r in drift_psi_categorical(ref, cur, "lang").collect()}
    assert out["fr"].psi_term is None and out["fr"].n_cur == 0
    assert out["de"].psi_term is None and out["de"].n_ref == 0
    assert out["en"].p_ref == 0.8 and out["en"].p_cur == 0.5
    import math
    assert out["en"].psi_term == round((0.8 - 0.5) * math.log(0.8 / 0.5), 6)


def test_group_trend_exact_line(spark):
    """y = 2x + 3 exactly: slope 2, intercept 3, r2 = 1; constant-x
    group yields NULL slope."""
    from hpaste_spark.operators.profile import group_trend

    rows = [("a", float(x), 2.0 * x + 3.0) for x in range(10)]
    rows += [("b", 5.0, float(v)) for v in range(4)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_trend(df, "g", "x", "y").collect()}
    assert (out["a"].slope, out["a"].intercept, out["a"].r2) == (2.0, 3.0, 1.0)
    assert out["b"].slope is None


def test_exact_group_quantiles_type1_semantics(spark):
    """Type-1 quantile contract: each q returns the smallest value
    whose cumulative count reaches ceil(q*n) — cross-checked against a
    pure-python model on ties, skew, and a singleton group."""
    import math

    from hpaste_spark.operators.profile import exact_group_quantiles

    groups = {
        "a": [1, 1, 1, 2, 3, 10, 10, 50, 100, 1000],  # ties + skew
        "b": [7],                                      # singleton
        "c": list(range(1, 101)),                      # uniform 1..100
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, v long")
    out = {
        r["source"]: r
        for r in exact_group_quantiles(
            df, "v", "source", qs=(0.25, 0.5, 0.75, 0.95)
        ).collect()
    }

    def type1(vs, q):
        vs = sorted(vs)
        return vs[math.ceil(q * len(vs)) - 1]

    for g, vs in groups.items():
        assert out[g]["n"] == len(vs)
        for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.95, "q95")]:
            assert out[g][col] == type1(vs, q), (g, q, out[g][col])


def test_exact_group_quantiles_integer_rank_arbitrary_q(spark):
    """The rank pick is exact rational arithmetic (cum*den >= num*n),
    not float ceil: q=0.07 over n=100 must select rank 7 — binary
    doubles give ceil(0.07*100) = ceil(7.000000000000001) = 8 — and a
    Fraction q with no finite decimal form works too (ADVICE r8)."""
    from fractions import Fraction

    from hpaste_spark.operators.profile import exact_group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 101)], "g string, v long"
    )
    out = exact_group_quantiles(df, "v", "g", qs=(0.07,)).collect()[0]
    assert out["q7"] == 7  # float ceil would report 8
    out3 = exact_group_quantiles(df, "v", "g", qs=(Fraction(1, 3),)).collect()[0]
    assert out3["q33"] == 34  # smallest v with 3*cum >= 100

    import pytest

    with pytest.raises(ValueError):
        exact_group_quantiles(df, "v", "g", qs=(1.5,))


def test_band_entropy_counts_and_millibits(spark):
    """band_entropy on a hand-computable banded table: exact bucket
    extremes, type-1 p99, and floor-millibit Shannon entropy (a
    uniform band reads exactly its key-width bits)."""
    import math

    from hpaste_spark.operators.profile import band_entropy

    rows = [(0, k) for k in ["a", "a", "a", "b"]] + [
        (1, k) for k in ["x", "y", "z", "w"]
    ]
    df = spark.createDataFrame(rows, "band_idx int, band_key string")
    out = {r["band_idx"]: r for r in band_entropy(df).collect()}

    # band 0: buckets {a:3, b:1} → H = 2 − (3·log2 3)/4 ≈ 0.811278
    h0 = math.floor((2.0 - (3 * math.log2(3)) / 4) * 1000)
    assert out[0]["n_rows"] == 4 and out[0]["n_buckets"] == 2
    assert out[0]["max_bucket"] == 3 and out[0]["p99_bucket"] == 3
    assert out[0]["entropy_millibits"] == h0 == 811

    # band 1: uniform over 4 keys → exactly 2 bits
    assert out[1]["max_bucket"] == 1 and out[1]["p99_bucket"] == 1
    assert out[1]["entropy_millibits"] == 2000


def test_ngram_novelty_hand_fixture(spark):
    """First doc is 100% novel; an exact repeat is 0% novel; a doc
    sharing half its grams with an earlier doc scores the exact ppm;
    short docs (< n tokens) are absent."""
    from hpaste_spark.operators.profile import ngram_novelty

    rows = [
        (1, "a b c d e f"),          # grams: abcde, bcdef  -> both novel
        (2, "a b c d e f"),          # exact repeat         -> 0 novel
        (3, "a b c d e x y z w v"),  # abcde seen; 5 others novel
        (4, "too short"),            # < 5 tokens           -> absent
    ]
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(
            spark.createDataFrame(rows, "doc_id long, text string"), n=5
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (2, 2)
    assert out[1]["novelty_ppm"] == 1_000_000
    assert (out[2]["n_grams"], out[2]["n_novel"]) == (2, 0)
    assert (out[3]["n_grams"], out[3]["n_novel"]) == (6, 5)
    assert out[3]["novelty_ppm"] == 5_000_000 // 6


def test_ngram_novelty_counts_distinct_grams_once(spark):
    """Within-doc gram repetition collapses before counting: a doc
    that is one phrase repeated has exactly its distinct grams."""
    from hpaste_spark.operators.profile import ngram_novelty

    text = " ".join(["p q r s t"] * 3)  # 15 tokens, 11 gram positions
    out = ngram_novelty(
        spark.createDataFrame([(1, text)], "doc_id long, text string"), n=5
    ).collect()[0]
    # distinct grams of the repeated phrase: the 5 rotations of p q r s t
    assert out["n_grams"] == 5
    assert out["n_novel"] == 5


def test_kcenter_select_hand_fixture(spark):
    """On a line of 1-D points {0, 1, 10, 11, 30}, greedy k-center
    seeded at id-min (value 0) picks 30 (d2=900), then 11
    (min(121, 361)=121 beats 10's min(100, 400)=100), then the d2=1
    tie between values 1 and 10 resolves to the smaller id; radii
    non-increasing."""
    from hpaste_spark.operators.sampling import kcenter_select

    pts = [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [11.0]), (5, [30.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = {r["sel_rank"]: r for r in kcenter_select(df, k=4).collect()}
    assert [out[t]["vec_id"] for t in (1, 2, 3, 4)] == [1, 5, 4, 2]
    assert out[1]["dist2"] is None
    assert out[2]["dist2"] == 900.0
    assert out[3]["dist2"] == 121.0
    assert out[4]["dist2"] == 1.0
    radii = [out[t]["dist2"] for t in (2, 3, 4)]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_select_stops_short_and_breaks_ties_low_id(spark):
    """k beyond the point count stops at n rows; equidistant argmax
    candidates resolve to the smaller id."""
    from hpaste_spark.operators.sampling import kcenter_select

    pts = [(7, [0.0]), (9, [4.0]), (8, [-4.0])]  # 8 and 9 tie at d2=16
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = kcenter_select(df, k=10).collect()
    assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["sel_rank"])] == [
        7, 8, 9,
    ]
    assert len(rows) == 3


def test_kcenter_assign_partitions_all_points(spark):
    """Assignment covers every point exactly once (Σ n_members = n);
    each point lands at its true nearest prototype; max_d2 of each
    cluster is bounded by the NEXT selection radius (a point farther
    than the rank-t radius from every selected center would itself
    have been selected at rank t)."""
    from hpaste_spark.operators.sampling import kcenter_assign, kcenter_select

    pts = [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [11.0]), (5, [30.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = {r["sel_rank"]: r for r in kcenter_assign(df, k=3).collect()}
    # selection: 1 (seed), 5 (900), 4 (121); assignment:
    #   center 1 <- {1, 2}; center 4 <- {3, 4}; center 5 <- {5}
    assert {(r["center_id"], r["n_members"]) for r in out.values()} == {
        (1, 2), (4, 2), (5, 1),
    }
    assert out[1]["max_d2"] == 1.0   # point 2 at dist2 1
    assert out[3]["max_d2"] == 1.0   # point 10 -> center 11
    assert out[2]["max_d2"] == 0.0   # center 5 alone
    sel = kcenter_select(df, k=3).collect()
    assert sum(r["n_members"] for r in out.values()) == 5
    assert len(sel) == 3
