"""Property-based fuzz of the blocked retrieval operators against
brute-force Python models:

- knn_join: every returned neighbor must carry the exact brute-force
  cosine, ranks must be the cosine order restricted to the operator's
  own candidate set (blocking may lower recall, but must never invent
  pairs, mis-rank, or return self-matches).
- containment_pairs: exact match against a set-algebra model — the
  operator is exact (no blocking loss), so output == model output.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.dedup import containment_pairs
from hpaste_spark.operators.similarity import knn_join

DIM = 8

vectors = st.lists(
    st.lists(st.integers(-5, 5), min_size=DIM, max_size=DIM).filter(
        lambda v: any(x != 0 for x in v)
    ),
    min_size=2,
    max_size=10,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(" ".join),
    min_size=2,
    max_size=6,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return 0.0 if na * nb == 0 else d / (na * nb)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=vectors, k=st.sampled_from([1, 3]))
def test_knn_join_never_invents_misranks_or_self_matches(spark, vecs, k):
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qs = emb.selectExpr("vec_id as query_id", "embedding")
    out = knn_join(emb, qs, k=k, bands=4, planes_per_band=2)
    by_q = {}
    for r in out.collect():
        assert r["query_id"] != r["neighbor_id"], "self-match"
        expect = _cos(vecs[r["query_id"]], vecs[r["neighbor_id"]])
        assert r["cos_sim"] == pytest.approx(expect, abs=1e-5), "invented cosine"
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["cos_sim"], r["neighbor_id"]) for r in rows]
        assert keys == sorted(keys), "rank must follow (cos desc, id)"


def _model_containment(docs, n=3, threshold=0.5):
    shingles = {}
    for i, text in docs:
        toks = text.split()
        s = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        if s:
            shingles[i] = s
    out = {}
    ids = sorted(shingles)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            x, y = ids[ai], ids[bi]
            inter = len(shingles[x] & shingles[y])
            if not inter:
                continue
            # contained side = smaller set, ties -> lower id
            if len(shingles[x]) <= len(shingles[y]):
                a, b, small = x, y, len(shingles[x])
            else:
                a, b, small = y, x, len(shingles[y])
            c = round(inter / small, 6)
            if c >= threshold:
                out[(a, b)] = c
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_containment_matches_set_model_exactly(spark, docs):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    expect = _model_containment(rows)
    assert got.keys() == expect.keys()
    for pair, c in expect.items():
        assert got[pair] == pytest.approx(c, abs=1e-6)


def test_random_projection_is_exact_integer_math(spark):
    """The projection must equal the integer-model reference exactly —
    quantized components x integer plane comps, one final division —
    independent of partitioning (fold order can't matter because every
    accumulation is an exact integer below 2^53)."""
    import math

    from hpaste_spark.operators.similarity import (
        PLANE_HALF,
        PLANE_MOD,
        PLANE_P1,
        PLANE_P2,
        random_projection,
    )

    vecs = [(1, [0.25, -1.5, 3.0]), (2, [1e-7, 0.0, -0.999999])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").repartition(4)
    out = {(r["vec_id"], r["pos"]): r["proj_val"]
           for r in random_projection(df, out_dim=4).collect()}
    scale = float(10**6 * PLANE_HALF) * math.sqrt(4.0)
    for vid, v in vecs:
        for j in range(4):
            units = sum(
                round(x * 10**6) * ((j * PLANE_P1 + d * PLANE_P2) % PLANE_MOD - PLANE_HALF)
                for d, x in enumerate(v)
            )
            assert out[(vid, j)] == round(units / scale, 6), (vid, j)
