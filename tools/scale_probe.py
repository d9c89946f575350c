"""10× scale probe for the dedup/ANN/vocab paths (VERDICT r3 item 7).

Synthesizes an sf1-equivalent documents/embeddings fixture (10× the
sf0.1 rows) into `.scratch/sf1_probe/`, runs the three scale-sensitive
queries at sf0.1 and sf1, and writes SCALE.md with wall-times and the
per-query scaling exponent alpha = log(t_sf1/t_sf01) / log(10) —
alpha ≈ 1 is linear, alpha ≈ 2 would mean a quadratic pair blow-up.

Synthesis preserves distributions without creating cross-replica
near-dups (which would inflate pair counts quadratically BY DATA
construction and mask the algorithmic scaling):

- documents: each replica r applies a per-replica lowercase-alphabet
  rotation (translate) — every shingle changes, so replicas are
  mutually dissimilar, while WITHIN a replica lengths, token shapes,
  and the fixture's planted near-dup structure are preserved exactly.
- embeddings: each replica rotates the vector positions by r — norms
  and within-replica neighbor structure preserved, replicas
  decorrelated.

Usage: python tools/scale_probe.py [--regen]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scratch", "sf1_probe")
PROBES = [
    "dedup_minhash_lsh",
    "sim_knn_join",
    "corpus_encode_tokens",
    # round-4 third-batch heavyweights (documents/embeddings only —
    # the probe fixture synthesizes just those two tables)
    "dedup_semantic",
    "dedup_winnow_overlap",
    "text_bm25_topk",
    "vec_pca_top_component",
]
# rotate lowercase AND digits per replica: tokens made of digits or
# mixed case would otherwise shingle identically across replicas,
# re-introducing the cross-replica near-dups the probe must avoid
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"
FROM_CHARS = ALPHA + DIGITS


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_docs = docs.count()
    n_vecs = emb.count()

    reps = spark.range(10).select(F.col("id").cast("int").alias("r"))
    rot_map = F.create_map(
        *[
            c
            for r in range(10)
            for c in (F.lit(r), F.lit(ALPHA[r:] + ALPHA[:r] + DIGITS[r:] + DIGITS[:r]))
        ]
    )
    d10 = (
        docs.crossJoin(reps)
        .withColumn("_rot", rot_map[F.col("r")])
        .select(
            (F.col("doc_id") + F.col("r").cast("long") * n_docs).alias("doc_id"),
            F.expr(f"translate(text, '{FROM_CHARS}', _rot)").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    d10.repartition(8).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    e10 = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r").cast("long") * n_vecs).alias("vec_id"),
            F.when(F.col("r") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.slice(F.col("embedding"), F.col("r") + 1, F.size("embedding")),
                    F.slice(F.col("embedding"), F.lit(1), F.col("r")),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    e10.repartition(8).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")


def main() -> None:
    import __spark_entry__ as entry_mod
    from hpaste_spark import get_spark

    spark = get_spark("scale-probe")
    qs = entry_mod.queries()

    if "--regen" in sys.argv or not os.path.isdir(f"{SF1}/embeddings.parquet"):
        synthesize(spark)
        print("synthesized", SF1, flush=True)

    def run(name: str, sf_dir: str) -> float:
        # min of 2: strip residual one-time costs (broadcast build,
        # codegen of this exact plan) so alpha reflects data growth
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm codegen/JIT once at the tiny SF
    for name in PROBES:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    rows = []
    for name in PROBES:
        t_small = run(name, SF01)
        t_big = run(name, SF1)
        n_small = qs[name](spark, SF01).count()
        n_big = qs[name](spark, SF1).count()
        alpha = math.log(t_big / t_small) / math.log(10)
        rows.append((name, t_small, t_big, alpha, n_small, n_big))
        print(
            f"{name:28s} sf0.1={t_small:6.2f}s sf1={t_big:7.2f}s alpha={alpha:.2f} "
            f"rows {n_small}->{n_big}",
            flush=True,
        )

    lines = [
        "# SCALE — 10× scale probe (synthetic sf1, see tools/scale_probe.py)",
        "",
        "Synthetic sf1 = 10× sf0.1 documents/embeddings with per-replica",
        "alphabet/position rotation (replicas mutually dissimilar, so pair",
        "counts scale with the data, not quadratically by construction).",
        "alpha = log10(t_sf1 / t_sf0.1): 1.0 = linear, 2.0 = quadratic.",
        "Output rows are reported to show the WORK scales ~10× linearly",
        "even where wall-time is sublinear (local[32] has idle capacity at",
        "sf0.1, so extra data fills slots before it adds wall-time).",
        "",
        "| query | sf0.1 (s) | sf1 (s) | alpha | rows sf0.1 | rows sf1 |",
        "|---|---|---|---|---|---|",
    ]
    for name, t_small, t_big, alpha, n_small, n_big in rows:
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {alpha:.2f} | {n_small} | {n_big} |"
        )
    lines += [
        "",
        "Interpretation: the banded-LSH dedup and k-NN joins candidate via",
        "capped equi-joins and the vocabulary/encode path tops-k before any",
        "single-partition work, so wall-time should grow ~linearly (alpha",
        "near 1; somewhat below 1 when the sf0.1 run is fixed-cost",
        "dominated, somewhat above when bucket fan-out grows with corpus",
        "density).  An alpha near 2 would flag a quadratic pair expansion.",
        "",
    ]
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()
