"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS (MinHash-LSH / SimHash / embedding
candidates, operators/dedup.py) into CLUSTER assignments so a corpus
cleaner can keep exactly one document per duplicate group.

The reference has no iterative primitive at all — an HPaste user would
chain MR jobs by hand (HJob task DAG, mapreduce/mapreduce2.scala:
277-419) one hop per job.  Here it is iterative min-label propagation
over DataFrames:

    labels(v) ← min(labels(v), min over neighbors u of labels(u))

repeated until fixpoint.  Each round is ONE shuffle (groupBy node);
lineage is cut every round with localCheckpoint so the plan doesn't
grow unboundedly; convergence is detected by the monotone label-sum
(strictly decreasing until fixpoint, so equal sums ⇔ converged — one
cheap aggregate per round, no full-join diff).

Scale posture: rounds = graph diameter.  Near-dup clusters are tiny
dense blobs (pairs come from shared LSH buckets), so diameter is
single-digit in practice; for adversarial long-chain graphs switch to
the large-star/small-star doubling variant (O(log d) rounds) — the
per-round plumbing below is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the smallest
    node id in its component.  Returns (node, cluster_id); only nodes
    appearing in at least one edge are emitted (isolated rows are their
    own cluster by definition — union them in at the call site if
    needed)."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    labels = (
        sym.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).first()[0]

    for _ in range(max_iter):
        prop = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("label")
        )
        labels = (
            labels.unionByName(prop).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
