"""pca_top_component semantics: recovers a planted dominant direction,
returns a unit vector, respects the sign convention."""

import math

import pytest

from hpaste_spark.operators.linalg import pca_top_component


def test_pca_recovers_planted_direction(spark):
    """Points at t·u for u ∝ (3,4,0,0) plus tiny off-axis jitter: the
    top component must align with u (|cos| > 0.99) and be unit-norm."""
    u = [0.6, 0.8, 0.0, 0.0]
    rows = []
    for i in range(-20, 21):
        t = float(i)
        jitter = 0.01 * ((i % 3) - 1)
        rows.append(([t * u[0], t * u[1], jitter, -jitter],))
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = sorted(pca_top_component(df, iterations=3).collect(), key=lambda r: r.pos)
    v = [r.loading for r in out]
    assert len(v) == 4 and [r.pos for r in out] == [0, 1, 2, 3]
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-4
    cos = sum(a * b for a, b in zip(v, u))
    assert abs(cos) > 0.99, f"must recover the planted direction, got {v}"
    assert v[0] >= 0, "sign convention: loading[0] non-negative"


def test_pca_rejects_zero_iterations(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError):
        pca_top_component(df, iterations=0)


def test_remove_top_component_residual_drops(spark):
    """On the planted-direction corpus, removing the top component must
    leave only the jitter: resid_norm << centered_norm for the big-t
    rows, and resid² + proj² ≈ centered² everywhere (Pythagoras)."""
    from hpaste_spark.operators.linalg import remove_top_component

    u = [0.6, 0.8, 0.0, 0.0]
    rows = []
    for i in range(-20, 21):
        t = float(i)
        jitter = 0.01 * ((i % 3) - 1)
        rows.append((i, [t * u[0], t * u[1], jitter, -jitter]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in remove_top_component(df).collect()}
    assert len(out) == 41
    big = out[20]
    assert big.resid_norm < 0.05 * big.centered_norm
    for r in out.values():
        assert abs(r.proj ** 2 + r.resid_norm ** 2 - r.centered_norm ** 2) < 1e-3


def test_pca_two_components_orthogonal_and_planted(spark):
    """Two planted directions with different variances: component 1
    aligns with the stronger, component 2 with the weaker, and the two
    are orthogonal (deflation worked)."""
    from hpaste_spark.operators.linalg import pca_top_components

    u = [0.6, 0.8, 0.0, 0.0]      # strong direction
    w = [0.0, 0.0, 1.0, 0.0]      # weak direction
    # independent grid: variance along u is 9x the variance along w
    rows = []
    for i in range(-5, 6):
        for j in range(-5, 6):
            rows.append(
                ([3.0 * i * u[0], 3.0 * i * u[1], float(j), 0.0],)
            )
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = pca_top_components(df, n_components=2, iterations=3).collect()
    v1 = [r.loading for r in sorted((r for r in out if r.component == 1), key=lambda r: r.pos)]
    v2 = [r.loading for r in sorted((r for r in out if r.component == 2), key=lambda r: r.pos)]
    dot_uv1 = abs(sum(a * b for a, b in zip(v1, u)))
    dot_wv2 = abs(sum(a * b for a, b in zip(v2, w)))
    assert dot_uv1 > 0.99, v1
    assert dot_wv2 > 0.99, v2
    ortho = abs(sum(a * b for a, b in zip(v1, v2)))
    assert ortho < 1e-3, f"components must be orthogonal, got {ortho}"
