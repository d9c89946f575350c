"""Deterministic sampling / dataset-split operators (north star).

Training-data pipelines need splits that are (a) reproducible across
runs and engines, (b) stable under repartitioning, and (c) computable
without any global state — so everything here keys off a content hash
of the row id, never off rand() or row position.

The hash is the first 4 hex chars of md5(id-as-string) → int:
cross-engine reproducible (DuckDB: ('0x'||substr(md5(x),1,4))::BIGINT),
uniform enough for percentage splits, and cheap (one JVM md5 per row,
no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 65536  # 16 bits of the md5


def hash_bucket(col, buckets: int = 100):
    """Deterministic bucket in [0, buckets) from md5 of the value."""
    h = F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 4), 16, 10).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame, id_col: str, holdout_pct: int = 5, split_col: str = "split"
) -> DataFrame:
    """Tag each row 'train' / 'holdout' by id hash — an ~holdout_pct%
    holdout that is stable across runs, engines, and partitionings."""
    return df.withColumn(
        split_col,
        F.when(hash_bucket(F.col(id_col), 100) < holdout_pct, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    holdout_pct: int = 5,
    split_col: str = "split",
) -> DataFrame:
    """hash_split with the DEDUP-AWARE guarantee a real eval split
    needs: near-duplicate documents must land on the SAME side, or the
    holdout leaks into training through its surviving twins and every
    eval number is inflated.  ``pairs`` is any candidate duplicate-pair
    table (id_a, id_b) — MinHash LSH upstream; the split key is the
    doc's connected-component id (singletons key on their own id), so
    entire duplicate clusters move as one unit and the leakage count
    across the cut is structurally ZERO (split_leakage_eval prices the
    naive id-hash split against this).

    Scale shape: connected components over the pair graph via
    large-star/small-star (connected_components_star — O(log d) full
    rounds, so an adversarial long-chain duplicate graph converges in
    a handful of shuffles where min-label propagation would need
    O(diameter) rounds and trip its max_iter), then ONE id-equi
    shuffle join to attach cluster keys — the cluster table is
    proportional to the near-dup population, far too big to broadcast
    at 100 TB, so no broadcast hint.  Both CC implementations emit the
    identical (node, component-minimum) relation, so the split is
    byte-stable across the swap.  The split itself stays a per-row
    md5, stable across runs, engines, and partitionings."""
    from hpaste_spark.operators.graph import connected_components_star

    comp = connected_components_star(pairs, src="id_a", dst="id_b")
    out = df.join(comp, df[id_col] == comp["node"], "left").select(
        df["*"], F.coalesce(F.col("cluster_id"), df[id_col]).alias("_ckey")
    )
    return out.withColumn(
        split_col,
        F.when(
            hash_bucket(F.col("_ckey"), 100) < holdout_pct, F.lit("holdout")
        ).otherwise(F.lit("train")),
    ).drop("_ckey")


def stratified_take(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic n rows per group: rank by (id-hash, id) within the
    group and keep the first n.  One exchange on the group key; the
    hash ordering makes the choice uniform-ish and reproducible (a
    rand()-based sample is neither)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), HASH_BUCKETS), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    token_count_col,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each document to a (shard_id, bin_id) packing slot so
    that consecutive docs fill fixed token budgets — the
    pack-documents-into-context-windows step of an LLM training
    pipeline, made deterministic and shardable.

    Packing rule (offset packing): within a shard, docs are laid out in
    ``id_col`` order at running token offsets; a doc's bin is
    ``start_offset // budget``.  Unlike first-fit greedy (an inherently
    sequential fold), this rule is a pure window expression — a doc
    straddling a boundary counts toward the bin it STARTS in, matching
    the usual concat-then-chunk training layout where a document may
    continue into the next window.

    Scale shape: the only shuffle is on ``shard_id``
    (:func:`hash_bucket` of the id — reproducible in any engine), and
    each shard's cumulative sum is an independent window — no global
    order, no single-partition window, no driver state.  Shard count
    trades packing locality against parallelism; each shard packs
    independently so bins never span shards.

    Returns the input ids with (shard_id, bin_id, start offset) — join
    back to content for the actual concat, which stays layout-free
    here so the assignment is engine-comparable.
    """
    from pyspark.sql import Window

    tc = F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    d = df.select(F.col(id_col), tc.cast("long").alias("n_tokens")).withColumn(
        "shard_id", hash_bucket(F.col(id_col), n_shards)
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("bin_id", (F.col("start_off") / budget).cast("long"))
        .select(id_col, "shard_id", "bin_id", "start_off", "n_tokens")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict,
    default_rate: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing step
    of training-data assembly ("keep all en, half fr, a tenth of the
    rest"). Each row keeps iff ``md5-bucket(id) < rate(stratum) *
    buckets``, so the decision is a pure row-local projection: no
    shuffle, no rand(), reproducible across runs, engines, and
    partitionings, and monotone in the rate (raising a stratum's rate
    only ADDS rows — stable incremental re-mixes).

    ``rates`` maps stratum value → keep fraction in [0, 1]; unlisted
    strata use ``default_rate``.
    """
    thr = F.lit(int(default_rate * buckets))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(int(rate * buckets))).otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col), buckets) < thr)


#: weight quantum for temperature_mixture: stratum weights n^tau are
#: floored to multiples of 2^-20 BEFORE summing, so the normalizer is
#: an exact integer sum (a double sum over strata would be summation-
#: order-dependent and break cross-engine reproducibility)
WEIGHT_SCALE = 1 << 20


def temperature_mixture(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    tau: float = 0.5,
    target_frac: float = 0.5,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Temperature-based corpus re-mixing — the multilingual /
    multi-domain resampling step (mT5/XLM-R style): stratum ``s`` with
    share ``p_s = n_s/N`` is sampled with probability ``q_s ∝ p_s^tau``,
    flattening the mixture toward uniform as ``tau → 0`` (tau=1 is
    proportional, i.e. plain uniform downsampling).  Returns the kept
    rows; per-stratum keep rate is ``min(1, target_frac·N·q_s/n_s)`` so
    the output totals ~``target_frac·N`` rows (exactly the md5-bucket
    realization of it) with head strata downweighted and tail strata
    kept whole.

    Determinism/scale shape: one column-pruned count pass (hash-agg to
    |strata| rows) → the rate table is derived IN-PLAN and broadcast
    back, so the main pass is scan → broadcast join → row-local
    md5-threshold filter — no shuffle of the corpus, no rand(), no
    driver collect, monotone in ``target_frac`` (raising it only adds
    rows).  Cross-engine exactness: weights ``n^tau`` are floored to
    integer multiples of 2^-20 (``WEIGHT_SCALE``) before the normalizer
    sum, so the sum is exact integer arithmetic (order-free); the rate
    itself is then a deterministic double expression over exact longs,
    and tau=0.5 uses ``sqrt`` (IEEE correctly-rounded, bit-identical in
    any engine) rather than libm ``pow`` (1-ulp licensed).  The oracle
    replays the formula literally.
    """
    from pyspark.sql import Window

    n = F.col("_n")
    root = F.sqrt(n) if tau == 0.5 else F.pow(n, F.lit(float(tau)))
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    weighted = counts.select(
        stratum_col, "_n", F.floor(root * WEIGHT_SCALE).cast("long").alias("_w")
    )
    # normalizers as unpartitioned windows over the |strata|-row
    # aggregate — a broadcast-agg crossJoin here consumed the counts
    # lineage twice, re-running the corpus count pass per consumer
    # (exchange reuse does not bridge the broadcast boundary)
    w_all = Window.partitionBy()
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac))
        * F.sum("_n").over(w_all)
        * F.col("_w")
        / (n.cast("double") * F.sum("_w").over(w_all)),
    )
    rates = weighted.select(
        stratum_col, F.floor(rate * buckets).cast("long").alias("_thr")
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_bucket(F.col(id_col), buckets) < F.col("_thr"))
        .drop("_thr")
    )


def group_reservoir(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group "reservoir": the k rows per group ranked
    first by ``md5(id)`` — a uniform-looking, engine- and
    partitioning-stable sample (the md5 order is effectively random but
    identical everywhere, so re-runs and the oracle agree row-for-row,
    unlike ``rand()``-based reservoirs).

    Shape: one hash exchange on the group column + a per-group window
    top-k — no global sort, no driver state; group count bounds the
    output at |groups|·k rows regardless of input scale.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(id_col, group_col, "rn")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    group_col: "str | None" = None,
    seed: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws u in (0,1] from md5(seed||id)
    and is ranked by the key ``-ln(u) / w`` ascending — taking the k
    smallest keys is exactly weighted reservoir sampling, so inclusion
    probability tracks the row's weight share.  With ``group_col``, k
    rows per group (one exchange on the group key); without, a global
    top-k that plans as TakeOrderedAndProject (never a global sort).

    rand()-free: md5 makes the draw stable across runs, engines, and
    partitionings (DuckDB twin: ('0x'||substr(md5(...),1,13))::BIGINT).
    Zero/negative weights rank last (+inf key) and are only emitted if
    a group has fewer than k positive-weight rows.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h52 = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 13),
        16,
        10,
    ).cast("double")
    u = (h52 + 1.0) / float(1 << 52)  # (0, 1]
    key = F.when(
        F.col(weight_col) > 0, -F.log(u) / F.col(weight_col)
    ).otherwise(F.lit(float("inf")))
    tagged = df.withColumn("_sk", key)
    if group_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(F.col("_sk"), F.col(id_col))
        return (
            tagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(*df.columns, F.col("_rn").cast("int").alias("sample_rank"))
        )
    ordered = tagged.orderBy(F.col("_sk"), F.col(id_col)).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_sk"), F.col(id_col))
    return ordered.withColumn("sample_rank", F.row_number().over(w).cast("int")).select(
        *df.columns, "sample_rank"
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-pool
    document by how target-like its hashed unigram features look —
    ``log_weight(doc) = Σ_tokens ln p̂_target(b(tok)) − ln p̂_raw(b(tok))``
    over ``n_buckets`` hashed feature buckets with add-one smoothing.
    Returns (id, n_tokens, log_weight); downstream, resample the raw
    pool ∝ exp(log_weight) (:func:`weighted_sample`) to shift a
    web-scale corpus toward the target domain.

    Scale shape: both bag-of-hashed-unigrams models collapse to
    ``n_buckets`` rows, so the log-ratio table broadcasts; the 100 TB
    raw side streams through one bucket equi-join with no corpus-wide
    shuffle before the final per-doc aggregation.  Buckets reuse the
    md5 ``token_hash`` (mirrored verbatim in the DuckDB oracle:
    ``CAST(('0x'||substr(md5(tok),1,13)) AS BIGINT) % n_buckets``)."""
    from hpaste_spark.functions.text import token_hash, tokens

    def toks(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
            .select(id_col, (token_hash(F.col("_tok")) % n_buckets).alias("b"))
        )

    from pyspark.sql import Window

    rt = toks(raw)
    tgt = toks(target).groupBy("b").agg(F.count(F.lit(1)).alias("_ct"))
    rawc = rt.groupBy("b").agg(F.count(F.lit(1)).alias("_cr"))
    # model totals as unpartitioned windows over the ≤ n_buckets-row
    # full-join (each side's rows appear exactly once there and sum()
    # skips the join's nulls, so the window totals equal the per-side
    # aggregates) — broadcast-agg crossJoins here consumed each side's
    # lineage twice, i.e. re-ran the full corpus tokenize+count pass
    # for BOTH the raw and the target pool
    w_all = Window.partitionBy()
    feat = (
        tgt.join(rawc, "b", "full")
        .withColumn("_tt", F.sum("_ct").over(w_all))
        .withColumn("_tr", F.sum("_cr").over(w_all))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("_tt") + n_buckets)
                )
                - F.log(
                    (F.coalesce(F.col("_cr"), F.lit(0)) + 1).cast("double")
                    / (F.col("_tr") + n_buckets)
                )
            ).alias("_lw"),
        )
    )
    return (
        rt.join(F.broadcast(feat), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.round(F.sum("_lw"), 4) + F.lit(0.0)).alias("log_weight"),
        )
    )


def quality_threshold_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float,
    id_col: str = "doc_id",
    with_group_total: bool = False,
) -> DataFrame:
    """FineWeb-style per-group top-fraction selection WITHOUT a
    per-group global sort: keep (approximately) the best ``keep_frac``
    of rows in each ``group_col`` partition by score threshold.

    The naive formulation — ``percent_rank()`` partitioned by group —
    funnels each group through ONE task (a handful of sources over
    100 TB ⇒ a handful of tasks sorting terabytes).  Instead this runs
    the classic two-phase threshold plan:

    1. hash-aggregate row counts per (group, score) — scores are
       finite-precision (callers round to ≤4 dp), so this table is
       tiny regardless of corpus size and the agg map-side combines;
    2. two windows over THAT table (thousands of rows, not the
       corpus), sharing ONE group-keyed exchange — a running
       from-the-top sum and the whole-group total (the exact
       two-window idiom of profile.exact_group_quantiles; computing
       the total as a separate groupBy consumed the counts lineage
       twice, re-running the corpus aggregation per consumer) — then
       each group's threshold: the lowest score whose cumulative
       count still fits ``ceil(keep_frac·n)``.  If even the best
       tie-group overflows the target, the threshold falls back to
       that top score (whole-tie-group-keep semantics — thresholds
       never split a tie);
    3. the corpus streams once more through a broadcast join on the
       per-group threshold row and keeps ``score >= threshold``.

    Returns the input rows that clear their group's threshold, plus a
    ``threshold`` column (and the group's total input row count as
    ``_ntot`` when ``with_group_total`` — it rides the same broadcast
    row, so callers reporting keep fractions don't re-scan the corpus
    to count it).  Deterministic, rank-free, and both phases
    reproduce exactly in ANSI SQL (the oracle mirrors them).
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc())
    cum = counts.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_ntot", F.sum("_n").over(Window.partitionBy(group_col))
    )
    thr = cum.groupBy(group_col).agg(
        F.coalesce(
            F.min(
                F.when(
                    F.col("_cum") <= F.ceil(F.lit(keep_frac) * F.col("_ntot")),
                    F.col(score_col),
                )
            ),
            F.max(F.col(score_col)),
        ).alias("threshold"),
        F.max("_ntot").alias("_ntot"),
    )
    if not with_group_total:
        thr = thr.drop("_ntot")
    return df.join(F.broadcast(thr), group_col).filter(
        F.col(score_col) >= F.col("threshold")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
) -> DataFrame:
    """Deterministic training-export shard manifest: assign every row
    to one of ``n_shards`` output shards by content hash of its id
    (stable across runs, engines, and partitionings — never by row
    position, which changes under repartition), and report per-shard
    doc/token totals plus a balance ratio (shard docs ÷ ideal docs).

    This is the bookkeeping step before a 100 TB corpus is written as
    N tokenizer-ready files: the manifest is ONE map-side-combined
    hash-agg over the corpus keyed by a 16-bit-md5 shard id, and the
    balance column's grand total is an unpartitioned window over that
    ≤ n_shards-row aggregate — NOT a second consumer of the corpus
    lineage (a broadcast-total crossJoin here planned the entire
    upstream pipeline twice: exchange reuse never fires across a
    broadcast boundary, so e.g. pipe_export_manifest re-ran its whole
    quality+bloom chain just to count the manifest rows).  A
    downstream ``.repartition(n_shards, shard)`` + partitioned write
    then produces the actual files with the exact layout this
    manifest promised.
    """
    from pyspark.sql import Window

    shard = (hash_bucket(F.col(id_col), n_shards)).alias("shard")
    toks = F.col(token_count_col) if token_count_col else F.lit(1)
    per = (
        df.select(shard, toks.alias("_tok"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") * n_shards / total, 4).alias("balance"),
    )


def token_budget_mixture(
    df: DataFrame,
    tokens_col: str,
    source_col: str,
    weights: "dict[str, float]",
    budget_factor: float = 1.5,
    max_epochs: float = 2.0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Data-constrained mixture planning (the Muennighoff et al. 2023
    "Scaling Data-Constrained Language Models" bookkeeping): split a
    token budget across sources by weight, but cap every source at
    ``max_epochs`` passes over its available tokens, and redistribute
    the capped surplus to the uncapped sources in ONE deterministic
    round (proportional to their weights; a second round is never run
    — the single-round semantics is part of the contract, mirrored in
    the oracle).

    The budget is ``budget_factor ×`` the corpus's total available
    tokens, so the plan is scale-invariant: the same query produces a
    consistent mixture table at any SF.  Everything happens on the
    per-source aggregate (a handful of rows): one map-side-combined
    hash-agg over the corpus, then broadcast-scalar arithmetic — the
    100 TB cost is the one aggregation pass.

    Returns per source: avail_tokens, weight, alloc_tokens (2 dp),
    epochs (4 dp), capped.
    """
    w = F.lit(default_weight)
    for src, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w)

    from pyspark.sql import Window

    avail = df.groupBy(source_col).agg(F.sum(F.col(tokens_col)).alias("avail_tokens"))
    avail = avail.withColumn("weight", w)
    # both normalizer rounds are unpartitioned windows over the
    # |sources|-row aggregate — the previous broadcast-agg crossJoin
    # chain consumed `avail`'s lineage 4× (tot×2 within `a`, then
    # redo×2 within the result), re-running the corpus token-sum pass
    # each time
    w_all = Window.partitionBy()
    # desired and cap are FLOORED TO WHOLE TOKENS: every downstream
    # aggregate (leftover, uncapped-weight) then sums exact integers /
    # small-integer doubles, so no cross-row double summation order
    # can perturb the plan (weights are assumed exactly-representable
    # smallish values — 0.5, 1, 2, 3 — which sum exactly too)
    a = avail.select(
        source_col,
        "avail_tokens",
        "weight",
        F.floor(
            F.col("weight") / F.sum("weight").over(w_all)
            * F.lit(budget_factor) * F.sum("avail_tokens").over(w_all)
        ).cast("long").alias("_desired"),
        F.floor(F.lit(max_epochs) * F.col("avail_tokens")).cast("long").alias("_cap"),
    )
    a = a.withColumn("capped", F.col("_desired") > F.col("_cap")).withColumn(
        "_alloc1", F.least(F.col("_desired"), F.col("_cap"))
    )
    return (
        a.withColumn(
            "_leftover",
            F.sum(
                F.when(F.col("capped"), F.col("_desired") - F.col("_cap"))
            ).over(w_all),
        )
        .withColumn(
            "_uw", F.sum(F.when(~F.col("capped"), F.col("weight"))).over(w_all)
        )
        .withColumn(
            "_alloc2",
            F.when(
                ~F.col("capped") & (F.coalesce(F.col("_uw"), F.lit(0.0)) > 0),
                F.col("_alloc1")
                + F.coalesce(F.col("_leftover"), F.lit(0.0))
                * F.col("weight")
                / F.col("_uw"),
            ).otherwise(F.col("_alloc1")),
        )
        .select(
            source_col,
            "avail_tokens",
            "weight",
            F.round(F.col("_alloc2"), 2).alias("alloc_tokens"),
            F.round(F.col("_alloc2") / F.col("avail_tokens"), 4).alias("epochs"),
            "capped",
        )
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (Gonzalez 1985) diversity selection over an
    embedding column: seed with the smallest id, then repeatedly pick
    the point FARTHEST (squared L2) from everything selected so far.
    Returns (sel_rank, vec_id, dist2) — dist2 is the selection radius,
    i.e. the chosen point's distance² to the previously selected set,
    rounded to 6 dp (NULL for the seed).  The radius sequence is the
    coverage telemetry: dist2 at rank k is a 2-approximation bound on
    the best achievable k-center radius, so a curator reads the curve
    to size a diverse coreset / eval panel ("how many prototypes until
    the corpus is covered to radius r?").

    Deterministic end to end: the seed is the global min id, distances
    are sequential-fold double sums (the vec_kmeans_lloyd cross-engine
    contract), and argmax ties break toward the smaller id via a
    struct max — no RNG, so the DuckDB recursive-CTE twin reproduces
    the selection exactly.

    Scale shape: the working set carries a RUNNING min-distance column
    (least() against each new center), so the total distance work is
    n·k — never n·k² recomputation and never an all-pairs join.  Each
    round is one map stage plus a single-row struct-max aggregate; the
    1-row collect per round is the irreducible sequential dependency
    of greedy selection (the corpus.bpe_merges posture), and the
    working set is localCheckpoint'ed per round so round t+1 reads
    materialized rows instead of re-executing t chained projections
    (the kmeans centroid lesson).  At 100 TB the per-round cost is one
    scan of (id, vec, d2) — embarrassingly parallel, no shuffle.
    Reference analog: none (training-pipeline scope)."""
    spark = df.sparkSession
    picked = _kcenter_greedy(df, k, id_col, vec_col)
    out = spark.createDataFrame(
        [(r, vid, d2) for r, vid, d2, _ in picked],
        "sel_rank long, vec_id long, _raw double",
    )
    return out.select(
        "sel_rank",
        "vec_id",
        (F.round(F.col("_raw"), 6) + F.lit(0.0)).alias("dist2"),
    )


def _vec_dist2(col, vec) -> "F.Column":
    """Squared L2 of an array<double> column against a driver-side
    vector, as a sequential left fold (the vec_kmeans_lloyd
    cross-engine contract: both engines sum in index order)."""
    c = F.array(*[F.lit(float(x)) for x in vec])
    diff = F.zip_with(col, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _kcenter_greedy(df, k, id_col, vec_col):
    """Shared greedy loop: [(sel_rank, vec_id, dist2|None, vector)].

    The working set is O(corpus) rows of (id, vector, running d²), cut
    per round — so the cuts use DISK_ONLY localCheckpoints per the
    measured corpus-memory rule (SCALE.md: corpus-sized intermediates
    must never claim executor storage memory; same posture as
    graph._cut, round 11)."""
    from pyspark.storagelevel import StorageLevel

    w = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_e"),
    )
    head = w.orderBy("vec_id").limit(1).collect()
    if not head:
        raise ValueError("kcenter selection needs a non-empty input")
    seed = head[0]
    picked = [(1, int(seed["vec_id"]), None, list(seed["_e"]))]
    # lazy cuts (r13): an EAGER per-round checkpoint paid two actions
    # per round (materialize, then the argmax collect re-scanned the
    # materialized rows); eager=False folds the materialization into
    # the argmax action itself — one corpus pass per round, same rows,
    # and round t+1 still reads round t's materialized output.
    cand = (
        w.filter(F.col("vec_id") != seed["vec_id"])
        .withColumn("_d2", _vec_dist2(F.col("_e"), seed["_e"]))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    for rank in range(2, k + 1):
        row = cand.select(
            F.max(
                F.struct(
                    F.col("_d2").alias("d2"),
                    (-F.col("vec_id")).alias("nid"),
                    F.col("_e").alias("e"),
                )
            ).alias("s")
        ).collect()[0]["s"]
        if row is None:
            break  # fewer than k points
        picked.append((rank, -int(row["nid"]), float(row["d2"]), list(row["e"])))
        if rank < k:
            cand = (
                cand.filter(F.col("vec_id") != -int(row["nid"]))
                .withColumn(
                    "_d2", F.least(F.col("_d2"), _vec_dist2(F.col("_e"), row["e"]))
                )
                .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
            )
    return picked


def kcenter_assign(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coverage report for the greedy k-center prototypes: run
    :func:`kcenter_select`'s greedy loop, then assign EVERY point to
    its nearest prototype (squared L2, ties to the lower sel_rank) and
    roll up (sel_rank, center_id, n_members, max_d2) — max, not mean,
    because a cross-row float SUM is summation-order-dependent between
    engines while max is order-free; max_d2 is also the operative
    number (the cluster's true coverage radius).

    A skewed n_members histogram says the corpus is concentrated (the
    prototypes aren't where the mass is — consider kmeans for
    representation instead); a max_d2 far above the selection radius
    curve says k is too small.  Shape: the k centers ride into ONE map
    stage as literal vectors (an array_min over k (d2, rank) structs —
    no join, no shuffle for the assignment), then one k-row hash-agg."""
    spark = df.sparkSession
    picked = _kcenter_greedy(df, k, id_col, vec_col)
    w = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_e"),
    )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _vec_dist2(F.col("_e"), vec).alias("d2"),
                    F.lit(rank).cast("long").alias("r"),
                )
                for rank, _, _, vec in picked
            ]
        )
    )
    centers = spark.createDataFrame(
        [(r, vid) for r, vid, _, _ in picked], "sel_rank long, center_id long"
    )
    per = (
        w.select(best.alias("_b"))
        .select(F.col("_b.r").alias("sel_rank"), F.col("_b.d2").alias("_d2"))
        .groupBy("sel_rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("_d2").alias("_m"),
        )
    )
    return per.join(F.broadcast(centers), "sel_rank").select(
        "sel_rank",
        "center_id",
        "n_members",
        (F.round(F.col("_m"), 6) + F.lit(0.0)).alias("max_d2"),
    )
