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
lineage is cut every round with a DISK_ONLY localCheckpoint (see
:func:`_cut` — cut the plan WITHOUT letting the O(corpus) edge/label
tables claim executor storage memory, the measured round-10 rule from
SCALE.md) so the plan doesn't grow unboundedly; convergence is
detected by the monotone label-sum
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


def _cut(df: DataFrame, storage: str, eager: bool = True) -> DataFrame:
    """Cut an iterative loop's lineage WITHOUT claiming executor
    storage memory.  Iterative operators need a real lineage cut per
    round (``persist`` alone leaves the logical plan growing
    unboundedly), but the edge/label tables here are O(corpus), and
    SCALE.md's measured 100 TB memory rule says corpus-sized
    intermediates must never sit deserialized in the unified memory
    region the join/agg stages need (the weighted-jaccard 30× OOM,
    round 10).  ``'disk'`` (DEFAULT) = ``localCheckpoint`` with
    ``StorageLevel.DISK_ONLY`` — the lineage cut of a checkpoint with
    the serialized-to-local-disk block posture of DISK_ONLY persist;
    ``'checkpoint'`` = the plain MEMORY_AND_DESERIALIZED form (the
    pre-round-11 behavior, kept for A/B).  The default was MEASURED at
    the 30× probe (SCALE.md "Iterative-graph memory posture"): the
    plain form OOMs the default 8 GiB heap on the 30× pair graph while
    DISK_ONLY completes, mirroring the weighted-jaccard result."""
    from pyspark.storagelevel import StorageLevel

    if storage == "disk":
        return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
    if storage != "checkpoint":
        raise ValueError(f"storage must be 'checkpoint' or 'disk': {storage}")
    return df.localCheckpoint(eager=eager)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    storage: str = "disk",
) -> DataFrame:
    """Label every node reachable through ``edges`` with the smallest
    node id in its component.  Returns (node, cluster_id); only nodes
    appearing in at least one edge are emitted (isolated rows are their
    own cluster by definition — union them in at the call site if
    needed)."""
    sym = _cut(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        ),
        # materialize the symmetric edge list ONCE: every propagation
        # round joins against it, and callers hand in expensive
        # lineages (a full MinHash-LSH pass) that would otherwise
        # re-execute per round.  DISK_ONLY: edges are O(corpus)
        storage,
    )
    labels = _cut(
        sym.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node")),
        storage,
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]

    converged = False
    for _ in range(max_iter):
        prop = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("label")
        )
        labels = _cut(
            labels.unionByName(prop).groupBy("node").agg(F.min("label").alias("label")),
            storage,
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # partially-propagated labels are WRONG answers (a caller like
        # dedup_near_keep would keep/drop the wrong documents) — fail
        # loudly instead; long-diameter graphs belong on the O(log d)
        # star variant below
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the budget); raise max_iter or use "
            "connected_components_star"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 40,
    storage: str = "disk",
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): converges
    in O(log d) full rounds instead of min-label propagation's O(d), so
    adversarial long-chain graphs finish in a handful of shuffles.

    Each half-round is one groupBy-min + one re-emit over the edge set:

    - large-star: every node points its LARGER neighbors at the minimum
      of its neighborhood (incl. itself);
    - small-star: every node points its smaller-or-equal neighbors and
      itself at that minimum.

    Both steps preserve connectivity and only ever decrease the
    (root, size) potential; at fixpoint the edge set is a forest of
    depth-1 stars rooted at each component's minimum id.  Fixpoint is
    detected by the (edge count, endpoint checksum) pair going stable
    across a full round — large/small-star moves strictly shrink the
    checksum Σ(s+d) until the star state, so equal pairs ⇔ no move
    happened.  Output matches connected_components: (node, cluster_id).
    """
    e = _cut(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct(),
        storage,
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.unionByName(df.select(F.col("d").alias("s"), F.col("s").alias("d")))

    def _large_star(df: DataFrame) -> DataFrame:
        sym = _sym(df)
        m = sym.groupBy("s").agg(F.least(F.min("d"), F.first("s")).alias("m"))
        return (
            sym.join(m, "s")
            .filter(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # orient every edge large→small, then each center points its
        # small neighbors (and itself) at the neighborhood minimum
        oriented = df.select(
            F.greatest("s", "d").alias("s"), F.least("s", "d").alias("d")
        )
        m = oriented.groupBy("s").agg(F.min("d").alias("m"))
        pointed = oriented.join(m, "s").select(
            F.col("d").alias("s"), F.col("m").alias("d")
        )
        self_edges = m.select(F.col("s"), F.col("m").alias("d"))
        return (
            pointed.unionByName(self_edges)
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )

    def _sig(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("s") + F.col("d")).alias("c")
        ).first()
        return row["n"], row["c"]

    prev = _sig(e)
    converged = False
    for _ in range(max_iter):
        e = _cut(_small_star(_large_star(e)), storage)
        cur = _sig(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within max_iter={max_iter} rounds"
        )
    # star state: every edge points node → component root; roots appear
    # only on the d side (or are isolated post-contraction singletons)
    members = e.select(F.col("s").alias("node"), F.col("d").alias("cluster_id"))
    roots = e.select(F.col("d").alias("node"), F.col("d").alias("cluster_id")).distinct()
    return members.unionByName(roots).distinct()


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_iter: "int | None" = 12,
    storage: str = "disk",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list:

        r(v) ← (1-d)/N + d · Σ_{u→v} r(u) / outdeg(u)

    starting from the uniform 1/N vector.  Returns (node, rank).
    Nodes are the distinct edge SOURCES; feed an undirected graph as
    both directions (as the dedup pair graphs are) and every node both
    sends and receives, so no dangling-mass correction is needed —
    callers with genuinely directed graphs must add it themselves.

    Each iteration is one equi-join of the rank vector onto the edges
    (the rank side is |V| rows — broadcastable long after |E| isn't)
    plus one dst-keyed hash-agg, with ``localCheckpoint`` cutting the
    growing lineage per round (same posture as connected_components).
    A fixed iteration count, not convergence detection: at 100 TB the
    job graph must be known ahead of time, and 3-10 power iterations
    are the standard diminishing-returns budget.

    ``round_iter`` rounds the vector each iteration (default 12 dp) so
    a DuckDB oracle unrolling the same iterations stays bit-comparable
    — double summation-order drift (~1e-17/round) can never walk a
    value across a later rounding boundary.  N rides as a broadcast
    one-row aggregate, never a collect."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # e and deg are consumed by EVERY iteration's join — localCheckpoint
    # once (lazy, plan-only construction) so the edge derivation (often
    # an expensive upstream join/distinct) isn't re-run per round:
    # without this the 3-iteration supplier↔customer plan recomputed the
    # lineitem⋈orders distinct per round (5.6 s → 3.7 s at sf0.1)
    e = _cut(
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_t")),
        storage,
        eager=False,
    )
    deg = _cut(
        e.groupBy(F.col("_s").alias("v")).agg(F.count(F.lit(1)).alias("_d")),
        storage,
        eager=False,
    )
    n1 = deg.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    r = _cut(
        deg.crossJoin(F.broadcast(n1)).select(
            "v", "_d", (F.lit(1.0) / F.col("_n")).alias("_r")
        ),
        storage,
        eager=False,
    )
    for _ in range(iterations):
        contrib = (
            e.join(r, e["_s"] == r["v"])
            .select(F.col("_t").alias("v"), (F.col("_r") / F.col("_d")).alias("_c"))
            .groupBy("v")
            .agg(F.sum("_c").alias("_in"))
        )
        nxt = (
            deg.join(contrib, "v", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "v",
                "_d",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("_r"),
            )
        )
        if round_iter is not None:
            nxt = nxt.withColumn("_r", F.round(F.col("_r"), round_iter))
        r = _cut(nxt, storage, eager=False)
    return r.select(F.col("v").alias("node"), F.round(F.col("_r"), 6).alias("rank"))
