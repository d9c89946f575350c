"""A/B memory-posture probe for the iterative graph operators
(round-11 verdict ask #1).

Round 10 proved the general rule on `weighted_jaccard_pairs`: an
O(corpus) intermediate materialized deserialized into executor storage
memory (plain localCheckpoint) OOMs the default 8 GiB heap at the 30×
probe, while DISK_ONLY completes — corpus-sized intermediates must
never claim the unified memory region execution needs.  The iterative
graph operators (`connected_components`, `pagerank`) cut lineage every
round on O(edges) tables, the same hazard class.  This probe runs each
operator at 30× under both `storage='checkpoint'` (plain
localCheckpoint, the pre-round-11 form) and `storage='disk'`
(localCheckpoint with StorageLevel.DISK_ONLY — lineage cut, serialized
blocks on local disk, zero storage-memory claim) in a FRESH JVM per
run, and reports wall time plus the block-manager split
(memUsed/diskUsed summed over materialized RDDs) so the posture
difference is visible, not inferred.

Inputs:
- cluster: MinHash-LSH candidate pairs over the cached 30× documents
  fixture (`.scratch/sf30x_probe`) → connected_components.  The
  EXPENSIVE upstream lineage (full LSH pass) re-executing per round is
  what the edge-table cut prevents.
- pagerank: the supplier↔customer graph of `graph_pagerank_supplier_
  customer` replicated 30× with per-replica node-id offsets — 30
  disjoint copies, so degree structure and rank distribution per
  replica are preserved exactly while |V| and |E| scale 30×.

Usage:
    python tools/graph_memory_probe.py {cluster|pagerank} {disk|checkpoint}
prints one JSON line:
    {"query": ..., "storage": ..., "wall_s": ..., "rows": ...,
     "storage_mem_mb": ..., "storage_disk_mb": ...}
Run all four combos via fresh processes (heap state must not leak):
    for q in cluster pagerank; do for m in disk checkpoint; do
        python tools/graph_memory_probe.py $q $m; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF30 = os.path.join(REPO, ".scratch", "sf30x_probe")
FACTOR = 30


def _storage_split_mb(spark) -> tuple[float, float]:
    """Sum (memUsed, diskUsed) over all materialized RDDs from the
    block manager — shows WHERE the checkpointed blocks actually sit."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return round(mem / 2**20, 1), round(disk / 2**20, 1)


def run_cluster(spark, storage: str):
    from hpaste_spark.operators.dedup import minhash_lsh_candidates
    from hpaste_spark.operators.graph import connected_components

    docs = spark.read.parquet(f"{SF30}/documents.parquet")
    pairs = minhash_lsh_candidates(docs, num_hashes=16, bands=4, shingle=3)
    comp = connected_components(pairs, src="id_a", dst="id_b", storage=storage)
    return comp.count()


def run_pagerank(spark, storage: str):
    from pyspark.sql import functions as F

    from hpaste_spark.operators.graph import pagerank

    li = spark.read.parquet(f"{SF01}/lineitem.parquet").select(
        "l_suppkey", "l_orderkey"
    )
    o = spark.read.parquet(f"{SF01}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("a"),
            (F.col("o_custkey") + 100000).alias("b"),
        )
        .distinct()
    )
    # 30 disjoint replicas: offset both endpoints by r * 10_000_000 —
    # node ids stay < 10M per replica, so replicas never share a node
    reps = spark.range(FACTOR).select(F.col("id").alias("r"))
    eR = e0.crossJoin(reps).select(
        (F.col("a") + F.col("r") * 10_000_000).alias("a"),
        (F.col("b") + F.col("r") * 10_000_000).alias("b"),
    )
    edges = eR.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        eR.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    r = pagerank(edges, iterations=3, storage=storage)
    row = r.agg(F.count(F.lit(1)).alias("n"), F.sum("rank").alias("s")).first()
    return row["n"]


def main() -> int:
    query, storage = sys.argv[1], sys.argv[2]
    from hpaste_spark import get_spark

    spark = get_spark(f"graph-memory-probe-{query}-{storage}")
    t0 = time.time()
    try:
        rows = {"cluster": run_cluster, "pagerank": run_pagerank}[query](
            spark, storage
        )
        wall = round(time.time() - t0, 2)
        mem_mb, disk_mb = _storage_split_mb(spark)
        print(
            json.dumps(
                {
                    "query": query,
                    "storage": storage,
                    "wall_s": wall,
                    "rows": rows,
                    "storage_mem_mb": mem_mb,
                    "storage_disk_mb": disk_mb,
                }
            )
        )
    except Exception as exc:  # OOM surfaces as a Py4J/connection error
        print(
            json.dumps(
                {
                    "query": query,
                    "storage": storage,
                    "wall_s": round(time.time() - t0, 2),
                    "error": f"{type(exc).__name__}: {str(exc)[:300]}",
                }
            )
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
