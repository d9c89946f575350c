"""Per-family scaling probe at two SFs x two core counts (r14,
VERDICT r13 ask #8).

The r13 8-vs-32-core block proved sf0.1 is fixed-overhead-bound (every
ratio far under the calibration ceiling), making per-operator
parallelism claims unfalsifiable at that SF alone.  This probe runs one
representative query per data-bound family at sf0.1 AND the 10x
synthetic fixture (.scratch/sf1_probe — documents/embeddings only, so
TPC-H/events families are out of scope), under local[$SPARK_GRAFT_CPUS],
best-of-2 through the noop sink, and prints one JSON line per query.

alpha = log10(t_10x / t_sf0.1) is the data exponent (1.0 = linear);
comparing 32- vs 8-core runs of the SAME sf gives the core-scaling
ratio per family.

Usage: SPARK_GRAFT_CPUS=32 python tools/family_scaling_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "sf1_probe",
)

#: one representative per data-bound family (documents/embeddings only)
FAMILIES = {
    "gram_substrate": "dedup_winnow_overlap",
    "decontaminate": "decontaminate_ngram",
    "bloom": "decontaminate_bloom",
    "weighted_jaccard": "dedup_weighted_jaccard",
    "kmv_sketch": "sketch_kmv_distinct",
    "minhash_lsh": "dedup_lsh_eval",
    "semdedup": "dedup_semantic",
    "ann_lsh_retrieval": "sim_knn_join",
    "ivfadc": "sim_ivfadc_residual_topk",
    "kmeans": "vec_kmeans_lloyd",
    "pca": "vec_pca_two_components",
    "exact_substr": "dedup_exact_substr_mask",
    "kcenter": "mix_kcenter_assign",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    import __spark_entry__ as entry_mod
    from hpaste_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("family-scaling-probe")
    qs = entry_mod.queries()

    for name in FAMILIES.values():
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()  # fair: persisted intermediates recompute
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    rows = {}
    for fam, name in FAMILIES.items():
        t_small = run(name, SF01)
        t_big = run(name, SF1)
        rows[fam] = {
            "query": name,
            "cpus": cpus,
            "sf0.1_s": t_small,
            "x10_s": t_big,
        }
        print(json.dumps({fam: rows[fam]}), flush=True)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(rows, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
