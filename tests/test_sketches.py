"""HLL sketch rollup: estimates near exact, union consistency."""

from pyspark.sql import functions as F

from hpaste_spark.operators.sketches import hll_rollup
from hpaste_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_hll_rollup_estimates_and_union(spark):
    o = load_table(spark, SF, "orders")
    got = {r.grp: r.approx_distinct for r in hll_rollup(o, "o_orderpriority", "o_custkey").collect()}
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority").agg(F.count_distinct("o_custkey").alias("n")).collect()
    }
    exact["ALL"] = o.select(F.count_distinct("o_custkey")).first()[0]
    assert set(got) == set(exact) and "ALL" in got
    for g, e in exact.items():
        assert abs(got[g] - e) <= max(3, 0.05 * e), (g, got[g], e)
    # union bound: the ALL estimate can't be below the largest group's
    assert got["ALL"] >= max(v for g, v in got.items() if g != "ALL")


def test_hll_rollup_deterministic(spark):
    o = load_table(spark, SF, "orders")
    a = sorted(map(tuple, hll_rollup(o, "o_orderpriority", "o_custkey").collect()))
    b = sorted(map(tuple, hll_rollup(o, "o_orderpriority", "o_custkey").collect()))
    assert a == b


def test_hdr_sketch_merge_associativity(spark):
    """Sketch of the union == cell-wise merge of per-shard sketches,
    in any merge tree shape (the mergeability contract that lets 100 TB
    shards ship fixed-size partials)."""
    import math
    import random

    from hpaste_spark.operators.sketches import hdr_merge, hdr_sketch

    rnd = random.Random(42)
    vals = [int(math.exp(rnd.uniform(0, 18))) for _ in range(500)]
    vals += [0, 1, 2, 3, (1 << 40) + 12345]
    shards = [vals[i::3] for i in range(3)]
    dfs = [
        spark.createDataFrame([(v,) for v in s], "v long") for s in shards
    ]
    whole = spark.createDataFrame([(v,) for v in vals], "v long")

    def cells(df):
        return {(r["bucket_lo"], r["width"]): r["cnt"] for r in df.collect()}

    expected = cells(hdr_sketch(whole))
    flat = hdr_merge(*[hdr_sketch(d) for d in dfs])
    nested = hdr_merge(
        hdr_merge(hdr_sketch(dfs[0]), hdr_sketch(dfs[1])), hdr_sketch(dfs[2])
    )
    assert cells(flat) == expected
    assert cells(nested) == expected


def test_hdr_quantile_band_guarantee_and_negative_rejection(spark):
    """The true type-1 quantile always lies inside its [lo, hi] band
    and the band is ≤ 2^-sub_bits of the value wide; negative values
    abort loudly instead of bucketing as garbage."""
    import math
    import random

    import pytest

    from hpaste_spark.operators.sketches import hdr_quantiles, hdr_sketch

    rnd = random.Random(7)
    vals = [int(math.exp(rnd.uniform(0, 18))) for _ in range(800)] + [0, 1]
    whole = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = (0.1, 0.5, 0.9, 0.99)
    out = hdr_quantiles(hdr_sketch(whole, sub_bits=7), qs=qs).collect()[0]
    svals = sorted(vals)
    assert out["n"] == len(vals)
    for q in qs:
        true_q = svals[math.ceil(q * len(svals)) - 1]
        p = f"q{int(round(q * 100))}"
        lo, hi = out[f"{p}_lo"], out[f"{p}_hi"]
        assert lo <= true_q <= hi, (q, lo, true_q, hi)
        assert (hi - lo + 1) <= max(1, lo >> 7), (q, lo, hi)

    with pytest.raises(Exception, match="negative value"):
        hdr_sketch(
            spark.createDataFrame([(-5,)], "v long")
        ).collect()


def test_hdr_baseline_artifact_family_pin(spark, tmp_path):
    """build_hdr_baseline → read_hdr_baseline round-trips the counter
    table + pinned geometry; a foreign bucket-rule family hard-errors
    instead of silently reading bands under the wrong rule."""
    import pytest

    from hpaste_spark.operators.sketches import (
        build_hdr_baseline,
        hdr_sketch,
        read_hdr_baseline,
    )

    df = spark.createDataFrame([("a", v) for v in range(1, 200)], "g string, v long")
    path = str(tmp_path / "hdr_base")
    build_hdr_baseline(df, path, "v", "g", sub_bits=5)
    sk, meta = read_hdr_baseline(spark, path)
    assert (meta["sub_bits"], meta["group_col"]) == (5, "g")
    direct = {
        (r["g"], r["bucket_lo"], r["width"]): r["cnt"]
        for r in hdr_sketch(df, "v", "g", sub_bits=5).collect()
    }
    stored = {
        (r["g"], r["bucket_lo"], r["width"]): r["cnt"] for r in sk.collect()
    }
    assert stored == direct and len(stored) > 0

    spark.createDataFrame(
        [(5, "g", 99)], "sub_bits INT, group_col STRING, family INT"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="rule 99"):
        read_hdr_baseline(spark, path)


def test_kmv_merge_equals_sketch_of_union(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly — the
    mergeability contract (both are 'the k smallest distinct hashes
    of the union'), here with k small enough that the bottom-k rule
    actually bites."""
    from hpaste_spark.operators.sketches import kmv_merge, kmv_sketch

    a = spark.createDataFrame(
        [("g", f"tok{i}") for i in range(200)], "grp string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"tok{i}") for i in range(100, 300)], "grp string, v string"
    )
    sa, sb = kmv_sketch(a, "grp", "v", k=64), kmv_sketch(b, "grp", "v", k=64)
    merged = sorted(r.h for r in kmv_merge(sa, sb, k=64).collect())
    direct = sorted(
        r.h for r in kmv_sketch(a.unionAll(b), "grp", "v", k=64).collect()
    )
    assert merged == direct and len(direct) == 64


def test_kmv_underfull_is_exact_and_estimator_in_band(spark):
    """Under-full sketch (distinct < k) returns the EXACT distinct
    count; past k the estimator lands within 4×RSE of truth."""
    from hpaste_spark.operators.sketches import kmv_estimate, kmv_sketch

    small = spark.createDataFrame(
        [("g", f"t{i}") for i in range(40)] * 3, "grp string, v string"
    )
    est = kmv_estimate(kmv_sketch(small, "grp", "v", k=256), k=256).collect()[0]
    assert (est.n_sketch, est.est_distinct) == (40, 40)

    big = spark.createDataFrame(
        [("g", f"t{i}") for i in range(5000)], "grp string, v string"
    )
    est2 = kmv_estimate(kmv_sketch(big, "grp", "v", k=256), k=256).collect()[0]
    assert est2.n_sketch == 256
    assert abs(est2.est_distinct - 5000) <= 0.25 * 5000


def test_kmv_registry_graders_all_in_band(spark):
    """Every source's distinct estimate and every pair's intersection
    estimate is in its stated band on the sf0.001 fixture."""
    import __spark_entry__ as m

    d = m._QUERIES["sketch_kmv_distinct"](spark, "/root/testdata/sf0.001")
    rows = d.collect()
    assert rows and all(r.in_band == 1 for r in rows)
    o = m._QUERIES["sketch_kmv_overlap"](spark, "/root/testdata/sf0.001")
    orows = o.collect()
    assert orows and all(r.in_band == 1 for r in orows)


def test_kmv_union_matches_direct_union_sketch(spark):
    """kmv_union's pair estimate == kmv_estimate over the two groups'
    values relabeled into one group (bottom-k commutes with union),
    and inclusion-exclusion telemetry is consistent in the exact
    (under-full) regime: |A∪B| + |A∩B| = |A| + |B|."""
    from pyspark.sql import functions as F

    from hpaste_spark.operators.sketches import (kmv_estimate,
                                                 kmv_intersect, kmv_sketch,
                                                 kmv_union)

    rows = [("a", f"t{i}") for i in range(150)] + [
        ("b", f"t{i}") for i in range(100, 250)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    sk = kmv_sketch(df, "grp", "v", k=64)
    pair = kmv_union(sk, k=64).collect()[0]
    direct = kmv_estimate(
        kmv_sketch(df.withColumn("grp", F.lit("u")), "grp", "v", k=64), k=64
    ).collect()[0]
    assert pair.est_union == direct.est_distinct

    # exact regime: all three sketches under-full -> exact set algebra
    sk256 = kmv_sketch(df, "grp", "v", k=256)
    est = {r.grp: r.est_distinct for r in kmv_estimate(sk256, k=256).collect()}
    inter = kmv_intersect(sk256, k=256).collect()[0].est_inter
    union = kmv_union(sk256, k=256).collect()[0].est_union
    assert union + inter == est["a"] + est["b"] == 300
    assert (union, inter) == (250, 50)
