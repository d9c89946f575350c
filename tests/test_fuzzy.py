"""operators/fuzzy.py — FastSS deletion-blocked edit-distance joins."""

from __future__ import annotations

from hpaste_spark.operators.fuzzy import edit_distance_pairs, fuzzy_match_counts

import pytest


def _df(spark, names):
    return spark.createDataFrame(list(enumerate(names)), "id long, s string")


def test_edit_distance_pairs_k1_is_lossless_and_exact(spark):
    """Substitution, insertion, deletion, and exact-duplicate pairs are
    all found; distance-2 pairs never leak through the verify."""
    names = ["cat", "cot", "cats", "at", "cat", "dog", "dig"]
    #        0      1      2       3     4      5      6
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           edit_distance_pairs(_df(spark, names), col="s", id_col="id").collect()}
    assert got[(0, 1)] == 1   # substitution
    assert got[(0, 2)] == 1   # insertion
    assert got[(0, 3)] == 1   # deletion
    assert got[(0, 4)] == 0   # exact duplicate
    assert got[(5, 6)] == 1
    assert (1, 2) not in got  # cot->cats is distance 2
    assert all(d <= 1 for d in got.values())
    # brute-force ground truth: the blocking must be lossless
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j): lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want


def test_fuzzy_match_counts_profile(spark):
    names = ["cat", "cat", "cot", "xyz"]
    got = {r["id"]: (r["n_exact"], r["n_near"]) for r in
           fuzzy_match_counts(_df(spark, names), col="s", id_col="id").collect()}
    assert got == {0: (1, 1), 1: (1, 1), 2: (0, 2), 3: (0, 0)}


def test_edit_distance_pairs_rejects_large_radius(spark):
    with pytest.raises(ValueError):
        edit_distance_pairs(_df(spark, ["a"]), col="s", id_col="id", max_dist=2)
