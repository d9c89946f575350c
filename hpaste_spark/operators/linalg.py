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
    # v0 = 1/sqrt(d), derived from the broadcast mean's length
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
        )
    # sign flip is an exact double negation of already-rounded values —
    # no further rounding, so no second boundary to disagree on
    sign = F.when(F.col("_v")[0] < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        vdf.select(F.posexplode(F.transform("_v", lambda t: t * sign)))
        .select(F.col("pos").cast("int").alias("pos"), F.col("col").alias("loading"))
    )
