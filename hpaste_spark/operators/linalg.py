"""Distributed linear algebra over embedding columns: top principal
component by power iteration.

The "what direction does this corpus vary in" primitive — used for
embedding de-meaning/whitening, ABTT-style dominant-direction removal
(Mu & Viswanath 2018), and as the 1-component PCA quality check before
committing to a projection dimension (complements the JL
random_projection operator, which is oblivious to the data).

Scale shape: everything is posexplode → hash-agg → tiny broadcast.
The mean and each iteration's unnormalized update

    w = Σ_x (x − μ) · ((x − μ)ᵀ v)

are (pos)-keyed aggregates over exploded (row, pos, value) triples —
map-side combined, never a d×d covariance materialization (d² matters
at d = 4096; the power update touches only d-vectors).  μ and v ride
as broadcast one-row arrays.  The loop is UNROLLED into one lazy plan
(query construction runs no jobs — the repo's plan-only hygiene rule),
so the embedding table appears O(iterations) times in the final plan;
a production caller doing many iterations should persist the centered
vectors and iterate eagerly instead — v is d doubles, trivially
driver-sized.

Cross-engine determinism: μ is rounded to 9 dp and each iteration's
normalized v to 7 dp, so double summation-order drift (~1e-13 of the
unrounded aggregates) can never reach a rounding boundary; both
engines then iterate on IDENTICAL vectors and the final 6 dp loadings
hash-match.  The sign convention fixes loading[0] >= 0 on the rounded
value."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpaste_spark.functions.vectors import as_double


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 3,
) -> DataFrame:
    """(pos, loading) — the unit top principal component of the
    centered vectors after ``iterations`` power steps from the uniform
    1/√d start, loadings rounded to 6 dp, sign fixed so loading[0] is
    non-negative.  ``pos`` is 0-based."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    x = df.select(as_double(F.col(vec_col)).alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    mu = (
        x.select(F.posexplode("_x").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("_mu")
        )
    )
    c = x.crossJoin(F.broadcast(mu)).select(
        F.zip_with("_x", "_mu", lambda a, b: a - b).alias("_c")
    )
    vdf = _power_iterate(c, mu, iterations)
    return vdf.select(F.posexplode("_v")).select(
        F.col("pos").cast("int").alias("pos"), F.col("col").alias("loading")
    )


def _power_iterate(c, mu, iterations):
    """Power-iterate over a centered-vector DataFrame ``c`` (column
    ``_c``); returns a 1-row DataFrame with ``_v``: the unit component,
    sign-fixed (element 0 >= 0) and rounded to 6 dp.  ``mu`` supplies
    the dimension for the uniform 1/sqrt(d) start."""
    vdf = mu.select(
        F.transform(
            F.col("_mu"), lambda _m: F.lit(1.0) / F.sqrt(F.size(F.col("_mu")))
        ).alias("_v")
    )
    for it in range(iterations):
        s_df = c.crossJoin(F.broadcast(vdf)).select(
            F.aggregate(
                F.zip_with("_c", "_v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("_s"),
            "_c",
        )
        w_rows = (
            s_df.select("_s", F.posexplode("_c").alias("pos", "xi"))
            .groupBy("pos")
            .agg(F.sum(F.col("xi") * F.col("_s")).alias("w"))
        )
        nrm = w_rows.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_n"))
        # last iteration rounds straight to the output precision:
        # re-rounding a 7dp value at 6dp lands EXACTLY on the half-up
        # boundary whenever digit 7 is 5, where Spark (decimal-repr
        # half-up) and C-libm engines (binary-double) disagree
        prec = 6 if it == iterations - 1 else 7
        vdf = (
            w_rows.crossJoin(F.broadcast(nrm))
            .select("pos", F.round(F.col("w") / F.col("_n"), prec).alias("vn"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vn"))),
                    lambda s: s["vn"],
                ).alias("_v")
            )
            # cut the growing lineage per round (lazy — construction
            # stays plan-only): without this, iteration k's plan embeds
            # every earlier iteration AND the centered matrix again —
            # ~2^k recompute; the 2-component query was 29 s at sf0.1,
            # 3.5 s with the checkpoints (same fix as graph.pagerank)
            .localCheckpoint(eager=False)
        )
    # sign flip is an exact double negation of already-rounded values —
    # no further rounding, so no second boundary to disagree on
    sign = F.when(F.col("_v")[0] < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return vdf.select(F.transform("_v", lambda t: t * sign).alias("_v"))


def pca_top_components(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    iterations: int = 3,
) -> DataFrame:
    """(component, pos, loading) — the top ``n_components`` principal
    directions by power iteration WITH DEFLATION: after extracting
    v_k, the data is projected onto its orthogonal complement
    (``c ← c − (c·v_k)·v_k``) and the next component is power-iterated
    on the residual.  Components are numbered from 1; each is
    unit-norm, 6 dp, sign-fixed like :func:`pca_top_component`.

    Deflation uses the FINAL rounded sign-fixed v_k, which both
    engines agree on bit-for-bit — and ``(c·(v·s))·(v_i·s)`` equals
    ``(c·v)·v_i`` exactly in IEEE arithmetic (two exact negations), so
    an oracle may deflate with the unsigned vector.  The unrolled lazy
    plan grows linearly in components × iterations; production callers
    wanting many components should persist each deflated matrix."""
    if n_components < 1:
        raise ValueError("n_components must be >= 1")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    x = df.select(as_double(F.col(vec_col)).alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    mu = (
        x.select(F.posexplode("_x").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("_mu")
        )
    )
    c = x.crossJoin(F.broadcast(mu)).select(
        F.zip_with("_x", "_mu", lambda a, b: a - b).alias("_c")
    ).localCheckpoint(eager=False)
    outs = []
    for k in range(1, n_components + 1):
        vdf = _power_iterate(c, mu, iterations)
        outs.append(
            vdf.select(F.posexplode("_v")).select(
                F.lit(k).cast("int").alias("component"),
                F.col("pos").cast("int").alias("pos"),
                F.col("col").alias("loading"),
            )
        )
        if k < n_components:
            from hpaste_spark.functions.vectors import dot

            # _p materializes as an attribute BEFORE the deflation
            # lambda references it: a lambda-captured dot expression
            # re-evaluates once PER ELEMENT (the winnow_select hazard,
            # 64x here).  The isNotNull guard makes _p doubly
            # referenced so CollapseProject keeps the boundary; _p is
            # never null, so semantics are unchanged.
            cj = c.crossJoin(F.broadcast(vdf)).select(
                "_c", "_v", dot(F.col("_c"), F.col("_v")).alias("_p")
            )
            c = cj.select(
                F.when(
                    F.col("_p").isNotNull(),
                    F.zip_with(
                        "_c", "_v", lambda a, vi: a - F.col("_p") * vi
                    ),
                )
                .otherwise(F.col("_c"))
                .alias("_c")
            ).localCheckpoint(eager=False)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def remove_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
) -> DataFrame:
    """All-but-the-top (Mu & Viswanath 2018) diagnostics: for every
    vector, its centered norm, its projection onto the corpus top
    principal component, and the residual norm after removing that
    direction — the "how much of each embedding is the dominant
    direction" signal used to decide whether ABTT post-processing is
    worth applying.  Returns (id, centered_norm, proj, resid_norm),
    all rounded to 6 dp.

    The residual norm is computed from the dot identities
    ``‖c − (c·v)v‖² = c·c − (c·v)²`` (v is unit), so the residual
    VECTOR is never materialized — per row this is two 64-element
    folds, not an array subtraction.  The component comes from
    :func:`pca_top_component` (its rounded, sign-fixed output — both
    engines agree on it bit-for-bit) and rides in as a broadcast
    one-row array next to the broadcast mean."""
    from hpaste_spark.functions.vectors import dot

    comp = pca_top_component(df, vec_col, iterations)
    vrow = comp.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "loading"))),
            lambda s: s["loading"],
        ).alias("_v")
    )
    x = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    mu = (
        x.select(F.posexplode("_x").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("_mu")
        )
    )
    c = x.crossJoin(F.broadcast(mu)).select(
        F.col(id_col), F.zip_with("_x", "_mu", lambda a, b: a - b).alias("_c")
    )
    cc = dot(F.col("_c"), F.col("_c"))
    proj = dot(F.col("_c"), F.col("_v"))
    return (
        c.crossJoin(F.broadcast(vrow))
        .select(
            F.col(id_col),
            F.round(F.sqrt(cc), 6).alias("centered_norm"),
            F.round(proj, 6).alias("proj"),
            F.round(
                F.sqrt(F.greatest(cc - proj * proj, F.lit(0.0))), 6
            ).alias("resid_norm"),
        )
    )
