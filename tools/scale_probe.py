"""10× scale probe for the dedup/ANN/vocab paths (VERDICT r3 item 7).

Synthesizes an sf1-equivalent documents/embeddings fixture (10× the
sf0.1 rows) into `.scratch/sf1_probe/`, runs the three scale-sensitive
queries at sf0.1 and sf1, and writes SCALE.md with wall-times and the
per-query scaling exponent alpha = log(t_sf1/t_sf01) / log(10) —
alpha ≈ 1 is linear, alpha ≈ 2 would mean a quadratic pair blow-up.

Synthesis preserves distributions without creating cross-replica
near-dups (which would inflate pair counts quadratically BY DATA
construction and mask the algorithmic scaling):

- documents: each replica r applies a per-replica AFFINE letter/digit
  bijection (translate through i → (a·i+b) mod 26 with a coprime to
  26, see _replica_map — 312 distinct letter maps, so letter-only
  text stays decorrelated to 312 replicas; the earlier rotation-only
  scheme had true period 26 on the pure-letter fixture vocabulary and
  made replicas r and r±26k byte-identical).  Every shingle changes,
  so replicas are mutually dissimilar, while WITHIN a replica lengths,
  token shapes, and the fixture's planted near-dup structure are
  preserved exactly.  (Two distinct affine maps can still agree on up
  to 2 letters, so single-LETTER tokens are not fully decorrelated
  across replica blocks — full tokens are.)
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


#: multipliers coprime with 26 — 12 of them × 26 shifts = 312 distinct
#: affine letter bijections, so LETTER-ONLY text stays decorrelated to
#: 312 replicas.  (The original rotation-only map had true period 26
#: on letter-only tokens: the lcm(26,10)=130 claim held only for
#: tokens mixing letters and digits, and the fixture vocabulary is
#: pure letters — at 100× every replica r was BYTE-IDENTICAL to
#: r±26k, verified 5000/5000 docs, silently turning the probe corpus
#: into 4-way exact duplicates.  Caught round 8 by
#: dedup_exact_substr_pairs' 100× row: 1.07M pairs where ~28k were
#: expected.)
AFFINE_A26 = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
AFFINE_A10 = [1, 3, 7, 9]


def _replica_map(r: int) -> str:
    """Target string for translate(): letters through the affine map
    i → (a·i + b) mod 26 with a = AFFINE_A26[r // 26], b = r % 26
    (distinct bijection for every r < 312 — two replicas share a map
    only when both a and b agree); digits through i → (a'·i + b') mod
    10 with a' = AFFINE_A10[r // 10 % 4], b' = r % 10."""
    a, b = AFFINE_A26[(r // 26) % len(AFFINE_A26)], r % 26
    letters = "".join(ALPHA[(a * i + b) % 26] for i in range(26))
    a2, b2 = AFFINE_A10[(r // 10) % len(AFFINE_A10)], r % 10
    digits = "".join(DIGITS[(a2 * i + b2) % 10] for i in range(10))
    return letters + digits


def synthesize(spark, factor: int = 10, out_dir: str = SF1) -> None:
    """Replicate the sf0.1 documents/embeddings ``factor``× with
    per-replica decorrelation.  Text: per-replica AFFINE alphabet/digit
    bijections (see :func:`_replica_map` — distinct for every replica
    r < 312 even on letter-only tokens, which is what the fixture
    vocabulary consists of).  Embeddings: position rotation r%64
    composed with a per-replica ±1 sign pattern ((pos·r) % 7 < 4;
    identity at r=0) — each replica transform is orthogonal
    (within-replica cosines preserved exactly) and the combination
    repeats only every lcm(64,7)=448 replicas, where bare rotation
    would let replicas r and r+64 coincide past 64×."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_docs = docs.count()
    n_vecs = emb.count()

    reps = spark.range(factor).select(F.col("id").cast("int").alias("r"))
    rot_map = F.create_map(
        *[
            c
            for r in range(factor)
            for c in (F.lit(r), F.lit(_replica_map(r)))
        ]
    )
    dN = (
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
    dN.repartition(max(8, factor)).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    rot = F.col("r") % 64
    rotated = F.when(rot == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), rot + 1, F.size("embedding")),
            F.slice(F.col("embedding"), F.lit(1), rot),
        )
    )
    eN = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r").cast("long") * n_vecs).alias("vec_id"),
            F.col("r"),
            rotated.alias("_rot"),
            "label",
        )
        .select(
            "vec_id",
            F.transform(
                F.col("_rot"),
                # (j·r)%7: identity for replica 0 (the original data
                # stays a subset); combined with the %64 rotation the
                # transform repeats only at lcm(64,7)=448 replicas
                lambda x, j: F.when((j * F.col("r")) % 7 < 4, x).otherwise(-x),
            ).alias("embedding"),
            "label",
        )
    )
    eN.repartition(max(8, factor)).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


#: the heaviest r4 paths, re-probed at 30× (VERDICT r4 #4) to confirm
#: alpha holds past local[32]'s idle-capacity regime; dedup_semantic
#: runs through the AUTO-K default (the r5 fix) — the pinned-k form is
#: the documented super-linear shape the 10× table already shows
BIG_PROBES = [
    "sim_knn_join",
    "dedup_winnow_overlap",
    "dedup_semantic_autok",
    # hierarchical assignment: the fix for autok's residual n·k·d term
    # (the AUTO form — the pinned-k1/k2 twin would reintroduce the
    # fixed-k pathology at 30× that autok vs dedup_semantic documents)
    "dedup_semantic_2level_auto",
    # round-6 cross-set / pair ops: decontamination and DSIR are
    # linear-by-design (bounded broadcast side, corpus streams);
    # frame dedup expands pairs only through the frame-hash equi-join
    "decontaminate_ngram",
    "dsir_importance_weights",
    "mm_shared_frames",
    # round-6 second batch: bloom keeps the broadcast side at m_bits
    # rows by construction; the threshold filter's agg table is
    # bounded by sources×10^4 score levels; hard negatives reuse the
    # banded-LSH pair expansion; rerank adds an R-row exact stage on
    # top of the compressed IVFADC scan
    "decontaminate_bloom",
    "filter_quality_threshold",
    "sim_hard_negatives",
    "sim_ivfadc_rerank",
    # round-7 batch: line dedup is two bounded shuffles (line key, doc
    # key — no pair expansion); LCS keeps the broadcast-benchmark gram
    # join and only HITS reach the island window; the stored bloom
    # variant replaces the benchmark pass with a <=m_bits-row read;
    # hierarchical training is the n·2√k·d fix measured directly by
    # the --train probe
    "dedup_lines",
    "decontaminate_lcs",
    "decontaminate_bloom_stored",
    "vec_kmeans_two_level",
    # round-7 second batch: CDC is dedup_lines' shape plus a per-doc
    # window; source-overlap fans out ≤ #sources per gram
    "dedup_cdc",
    "corpus_source_overlap",
    # round-7 third batch: CC-keyed split — the scale term is the
    # connected-components rounds over the LSH pair graph (pair count
    # bounded by dedup blocking) plus one id-equi shuffle join; the
    # leakage grader runs the split twice and joins pairs to both
    "split_leakage_eval",
    # cross-set excision (the r7 mask twin the 30× table lacked)
    "decontaminate_mask",
    # round-8: corpus-self ExactSubstr — candidate stage is a self
    # equi-join on the 10-gram hash with per-gram fan-out capped at
    # max_occ (boilerplate grams dropped), so hit volume grows with
    # genuinely-duplicated material, not corpus²; the mask adds the
    # token-level anti-join + per-doc reassembly
    "dedup_exact_substr_pairs",
    "dedup_exact_substr_mask",
]
BIG_MARK = "<!-- big-probe -->"


def big_probe(spark, qs, factor: int) -> None:
    """Run BIG_PROBES at sf0.1 vs a factor× synthetic fixture and
    replace the marked section of SCALE.md with the results."""
    big_dir = os.path.join(REPO, ".scratch", f"sf{factor}x_probe")
    if "--regen" in sys.argv or not os.path.isdir(f"{big_dir}/embeddings.parquet"):
        synthesize(spark, factor, big_dir)
        print("synthesized", big_dir, flush=True)

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in BIG_PROBES:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    lines = [
        BIG_MARK,
        "",
        f"## {factor}× probe — heaviest paths past the idle-capacity regime",
        "",
        f"Same synthesis, factor {factor} (affine letter maps stay",
        "distinct to 312×; embedding transforms to 448×).  At this factor",
        "the 32 local cores are saturated, so alpha ≈ 1 is the honest",
        "linear signal (the 10× table's alpha≪1 reflects idle slots).",
        "dedup_semantic_autok is the size-derived-k default: k grows with",
        "the corpus, holding cluster size — and per-row pair work — fixed.",
        "",
        f"| query | sf0.1 (s) | {factor}× (s) | alpha | rows sf0.1 | rows {factor}× |",
        "|---|---|---|---|---|---|",
    ]
    for name in BIG_PROBES:
        t_small = run(name, SF01)
        t_big = run(name, big_dir)
        n_small = qs[name](spark, SF01).count()
        n_big = qs[name](spark, big_dir).count()
        alpha = math.log(t_big / t_small) / math.log(factor)
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {alpha:.2f} | {n_small} | {n_big} |"
        )
        print(
            f"{name:28s} sf0.1={t_small:6.2f}s {factor}x={t_big:7.2f}s alpha={alpha:.2f} "
            f"rows {n_small}->{n_big}",
            flush=True,
        )
    lines += [
        "",
        "Reading the semantic-dedup rows: auto-k makes the cluster-local",
        "pair step LINEAR by construction (k = n/512 holds |cluster|",
        "fixed — at pinned k=8 this factor would be ~" + str(factor * factor) + "× the pair",
        "work).  Since round 7 `dedup_semantic_autok` ROUTES THROUGH the",
        "hierarchical assignment (`similarity.two_level_assign`, k1 coarse",
        "cells then k2 sub-centroids, n·(k1+k2)·d ≈ n·2√k·d), so its alpha",
        "should now track `dedup_semantic_2level_auto`'s — the flat n·k·d",
        "assignment term (alpha 0.87 in the r6 table) is gone from the",
        "default path; both rows below measure the same hierarchical plan",
        "at different target cluster sizes.",
        "",
    ]

    # surgical replace: sections AFTER the big-probe block (stream
    # probe, 100× rows) must survive a big-probe rerun
    _replace_section(BIG_MARK, lines)
    print("wrote big-probe section to SCALE.md")


HUNDRED_MARK = "<!-- probe-100x -->"


def subset_probe(spark, qs, factor: int, names: list, mark: str, title: str) -> None:
    """Run an explicit query subset at sf0.1 vs the factor× fixture and
    replace the ``mark`` section of SCALE.md — the --big harness with a
    caller-chosen list, used for the 100× rows (running all of
    BIG_PROBES at 100× would take hours for queries whose 30× rows
    already pin the growth).

    ACCUMULATES: existing table rows for queries NOT in this run are
    carried over, so a partial re-run can never silently discard
    earlier rounds' evidence (round 9 lost the r8 batch this way and
    had to restore it from git)."""
    carried = _existing_rows(mark, set(names))
    big_dir = os.path.join(REPO, ".scratch", f"sf{factor}x_probe")
    if "--regen" in sys.argv or not os.path.isdir(f"{big_dir}/embeddings.parquet"):
        synthesize(spark, factor, big_dir)
        print("synthesized", big_dir, flush=True)

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    lines = [
        mark,
        "",
        f"## {title}",
        "",
        "Rows accumulate across rounds (a partial re-run carries over",
        "rows it did not re-measure; same harness, idle box).",
        "",
        f"| query | sf0.1 (s) | {factor}× (s) | alpha | rows sf0.1 | rows {factor}× |",
        "|---|---|---|---|---|---|",
    ]
    lines += carried
    for name in names:
        t_small = run(name, SF01)
        t_big = run(name, big_dir)
        n_small = qs[name](spark, SF01).count()
        n_big = qs[name](spark, big_dir).count()
        alpha = math.log(t_big / t_small) / math.log(factor)
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {alpha:.2f} | {n_small} | {n_big} |"
        )
        print(
            f"{name:28s} sf0.1={t_small:6.2f}s {factor}x={t_big:7.2f}s alpha={alpha:.2f} "
            f"rows {n_small}->{n_big}",
            flush=True,
        )
    lines.append("")
    _replace_section(mark, lines)
    print(f"wrote {mark} section to SCALE.md")


def _existing_rows(mark: str, exclude: set) -> list:
    """Table rows already in the ``mark`` section whose first cell
    (query name) is NOT in ``exclude`` — the carry-over set for an
    accumulating partial re-run."""
    path = os.path.join(REPO, "SCALE.md")
    if not os.path.exists(path):
        return []
    text = open(path).read()
    if mark not in text:
        return []
    section = text.partition(mark)[2]
    nxt = section.find("<!-- ")
    if nxt != -1:
        section = section[:nxt]
    rows = []
    for line in section.splitlines():
        if line.startswith("| ") and not line.startswith("| query") \
                and not line.startswith("|--"):
            name = line.split("|")[1].strip()
            if name and name not in exclude and name != "---":
                rows.append(line)
    return rows


def _replace_section(mark: str, lines: list) -> None:
    """Replace (or append) the SCALE.md block that starts at ``mark``
    and runs to the next '<!-- ' marker."""
    path = os.path.join(REPO, "SCALE.md")
    text = open(path).read() if os.path.exists(path) else "# SCALE\n"
    if mark in text:
        head, _, rest = text.partition(mark)
        nxt = rest.find("<!-- ")
        text = head.rstrip() + "\n\n" + "\n".join(lines) + "\n\n" + (
            rest[nxt:] if nxt != -1 else ""
        )
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    with open(path, "w") as fh:
        fh.write(text)


STREAM_MARK = "<!-- stream-probe -->"

#: the streaming registry queries: each drains a real Structured
#: Streaming execution and returns the landed batch relation
STREAM_PROBES = [
    "stream_decontaminate_bloom",
    "stream_dedup_exact",
    "stream_tw_tumbling",
    "stream_session_window",
    "stream_incremental_dedup",
    "stream_ss_asof_attribution",
    "stream_asof_enrich",
    # round 9: multi-batch replays + per-batch HDR quantile partials
    "stream_tw_tumbling_multibatch",
    "stream_ss_asof_multibatch",
    "stream_session_window_multibatch",
    "stream_sketch_hdr",
    "stream_sketch_kmv",
]


def stream_probe(spark, qs, factor: int = 30) -> None:
    """Drain every streaming registry query against the factor×
    fixture (VERDICT r7 #6 — the streaming queries had no probe rows at
    all).  Timing includes the full drain: source listing, micro-batch
    execution, state store work, and the landed count.  events.parquet
    is not synthesized by the probe fixture, so the two event-time
    queries replay the sf0.1 events file replicated via symlinks
    factor× into the staging dir (same rows, factor× files → factor×
    the data through the SAME watermark/state machinery; dedup state
    grows with distinct keys, window state with distinct windows)."""
    big_dir = os.path.join(REPO, ".scratch", f"sf{factor}x_probe")
    if "--regen" in sys.argv or not os.path.isdir(f"{big_dir}/documents.parquet"):
        synthesize(spark, factor, big_dir)
        print("synthesized", big_dir, flush=True)
    # the events-based streams replay the sf0.1 file factor× (the doc
    # fixture has no events table); stage replicated symlinks so the
    # file source sees factor× distinct input files
    ev_dir = os.path.join(big_dir, "ev_rep")
    os.makedirs(ev_dir, exist_ok=True)
    tgt = os.path.abspath(os.path.join(SF01, "events.parquet"))
    for i in range(factor):
        link = os.path.join(ev_dir, f"events_{i}.parquet")
        if not os.path.lexists(link):
            os.symlink(tgt, link)

    def run(name: str, sf_dir: str):
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        return time.perf_counter() - t0, n

    lines = [
        STREAM_MARK,
        "",
        f"## Streaming drain probe — full availableNow executions at {factor}×",
        "",
        "One drain each (a second run would re-read the same landed",
        "dir); wall includes source listing + micro-batches + state +",
        "landed count.  The two event-time rows replay the sf0.1 events",
        f"file {factor}× via staged symlinks (replicated rows exercise the",
        "same watermark/state machinery; aggregate state grows with",
        "distinct windows/keys, not input volume).",
        "",
        f"| query | sf0.1 (s) | {factor}× (s) | alpha | rows sf0.1 | rows {factor}× |",
        "|---|---|---|---|---|---|",
    ]
    for name in STREAM_PROBES:
        uses_events = name in (
            "stream_tw_tumbling",
            "stream_session_window",
            "stream_ss_asof_attribution",
            "stream_asof_enrich",
            "stream_tw_tumbling_multibatch",
            "stream_ss_asof_multibatch",
            "stream_session_window_multibatch",
            "stream_sketch_hdr",
        )
        t_small, n_small = run(name, SF01)
        if uses_events:
            # point the staging at the replicated events dir by running
            # against a shim sf_dir whose events.parquet IS that dir
            shim = os.path.join(big_dir, "ev_shim")
            os.makedirs(shim, exist_ok=True)
            ln = os.path.join(shim, "events.parquet")
            if os.path.lexists(ln):
                os.remove(ln)
            os.symlink(ev_dir, ln)
            t_big, n_big = run(name, shim)
        else:
            t_big, n_big = run(name, big_dir)
        alpha = math.log(t_big / t_small) / math.log(factor)
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {alpha:.2f} | {n_small} | {n_big} |"
        )
        print(
            f"{name:28s} sf0.1={t_small:6.2f}s {factor}x={t_big:7.2f}s alpha={alpha:.2f} "
            f"rows {n_small}->{n_big}",
            flush=True,
        )
    lines.append("")
    _replace_section(STREAM_MARK, lines)
    print("wrote stream-probe section to SCALE.md")


GATE_MARK = "<!-- gate-probe -->"


def gate_probe(spark, factor: int = 30) -> None:
    """Forced-large-k broadcast-gate probe (round-6 verdict ask): on the
    factor× fixture, run two_level_assign with k1·k2·d ABOVE
    BROADCAST_DIM_ROWS so the sub-centroid dim table's broadcast hint
    must drop, and prove the degraded plan (a) contains no forced
    broadcast of that table and (b) completes without error —
    the OOM-at-design-scale path exercised, not just unit-tested.
    autoBroadcastJoinThreshold is disabled for the probe so any
    BroadcastHashJoin in the plan can only come from an explicit hint."""
    from pyspark.sql import functions as F

    import hpaste_spark.operators.similarity as sim

    big_dir = os.path.join(REPO, ".scratch", f"sf{factor}x_probe")
    if not os.path.isdir(f"{big_dir}/embeddings.parquet"):
        synthesize(spark, factor, big_dir)
    emb = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    n = emb.count()
    dim = sim._vec_dim(emb, "embedding")
    # pick k1·k2·d just past the ceiling (d=64 → 140·120·64 ≈ 1.08M)
    k1, k2 = 140, 120
    assert k1 * k2 * dim > sim.BROADCAST_DIM_ROWS
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tl = sim.two_level_assign(emb, k1, k2)
        qe = tl._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = qe.explainString(mode)
        # only the LEVEL-1 hint may broadcast (k1·d is under the
        # ceiling; its subtree legitimately appears once per consumer
        # of the assignment).  The sub-centroid join is keyed
        # (cid1, pos) — so with autoBroadcastJoinThreshold=-1, a
        # BroadcastHashJoin whose join keys mention cid1 could only be
        # the sub-level hint the gate must have dropped.  ("is a
        # shuffle join present" would be trivially true here: the
        # id-keyed joins always sort-merge under threshold=-1, so it
        # proves nothing about the dim table — r6 advice.)
        import re as _re

        bhj_blocks = [
            b for b in plan.split("\n\n")
            if _re.match(r"\(\d+\) BroadcastHashJoin", b.strip())
        ]
        n_bhj = len(bhj_blocks)
        shuffled = n_bhj >= 1 and not any("cid1" in b for b in bhj_blocks)
        t0 = time.perf_counter()
        tl.write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        rows = tl.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    lines = [
        GATE_MARK,
        "",
        f"## Forced-large-k broadcast-gate probe ({factor}×)",
        "",
        f"`two_level_assign(k1={k1}, k2={k2})` on the {factor}× fixture",
        f"(n={n}, d={dim}): the sub-centroid dim table is k1·k2·d =",
        f"{k1 * k2 * dim:,} rows — past `BROADCAST_DIM_ROWS` =",
        f"{sim.BROADCAST_DIM_ROWS:,} — so the broadcast hint drops and the",
        "sub-level assignment joins by SHUFFLE on (cid1, pos).  Under the",
        "auto-k contract this table grows O(n); before round 6 the hint",
        "was unconditional, a guaranteed broadcast OOM at the corpus",
        "sizes auto-k exists for (round-5 verdict).",
        "",
        "| check | result |",
        "|---|---|",
        f"| no BroadcastHashJoin keyed on cid1 (sub-centroid table not force-broadcast; level-1 hint only) | {shuffled} (bhj_nodes={n_bhj}) |",
        f"| completed without error | True |",
        f"| wall-clock (s) | {secs:.2f} |",
        f"| rows assigned | {rows} (= n: {rows == n}) |",
        "",
    ]

    path = os.path.join(REPO, "SCALE.md")
    text = open(path).read() if os.path.exists(path) else "# SCALE\n"
    if GATE_MARK in text:
        head, _, rest = text.partition(GATE_MARK)
        # strip the old gate section (ends at the next marker or EOF)
        tail = rest.partition(BIG_MARK)
        text = head + (BIG_MARK + tail[2] if tail[1] else "")
    if BIG_MARK in text:
        head, _, rest = text.partition(BIG_MARK)
        text = head + "\n".join(lines) + "\n" + BIG_MARK + rest
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    with open(path, "w") as fh:
        fh.write(text)
    print(f"gate probe: shuffled={shuffled} secs={secs:.2f} rows={rows}")


TRAIN_MARK = "<!-- train-probe -->"


def train_probe(spark, factor: int = 30) -> None:
    """Hierarchical vs flat k-means TRAINING at auto-k-scale k (round-6
    verdict ask #2): on the factor× fixture with k_total derived from
    the corpus (⌈n/512⌉ — the semantic-dedup contract), time one full
    flat Lloyd train (ivf_centroids, n·k_total·d per iteration) against
    the two-level train (two_level_centroids, n·(k1+k2)·d) at the SAME
    k_total = k1·k2 budget — the measured training-side twin of the
    assignment saving the 30× alpha table shows."""
    import math as _math

    import hpaste_spark.operators.similarity as sim

    big_dir = os.path.join(REPO, ".scratch", f"sf{factor}x_probe")
    if not os.path.isdir(f"{big_dir}/embeddings.parquet"):
        synthesize(spark, factor, big_dir)
    emb = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    n = emb.count()
    k_total = max(8, -(-n // 512))
    k1 = max(2, _math.ceil(_math.sqrt(k_total)))
    k2 = -(-k_total // k1)

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t_flat = timed(sim.ivf_centroids(emb, k_total, iterations=2))
    t_two = timed(
        sim.two_level_centroids(emb, k1, k2, iterations=2, sub_iterations=2)
    )

    lines = [
        TRAIN_MARK,
        "",
        f"## Hierarchical k-means TRAINING probe ({factor}×)",
        "",
        f"n={n}, d=64, auto-k contract k_total=⌈n/512⌉={k_total}",
        f"(k1={k1}, k2={k2}, k1·k2={k1 * k2}).  Two Lloyd iterations each.",
        "Flat refinement scores all k_total centroids per vector per",
        f"iteration (n·k·d); two-level scores k1 then its own cell's k2",
        "(n·(k1+k2)·d) — the training-side twin of the assignment fix.",
        "",
        "| train path | wall (s) | per-vector score width |",
        "|---|---|---|",
        f"| flat `ivf_centroids(k={k_total})` | {t_flat:.2f} | {k_total} |",
        f"| `two_level_centroids({k1},{k2})` | {t_two:.2f} | {k1 + k2} |",
        "",
        f"Speedup {t_flat / t_two:.1f}× at {factor}×; the gap widens with n",
        "because k_total ∝ n while k1+k2 ∝ √n.",
        "",
    ]
    path = os.path.join(REPO, "SCALE.md")
    text = open(path).read() if os.path.exists(path) else "# SCALE\n"
    if TRAIN_MARK in text:
        head, _, rest = text.partition(TRAIN_MARK)
        nxt = rest.find("<!-- ")
        text = head + (rest[nxt:] if nxt != -1 else "")
        text = text.rstrip() + "\n\n"
    else:
        text = text.rstrip() + "\n\n"
    with open(path, "w") as fh:
        fh.write(text + "\n".join(lines))
    print(f"train probe: flat={t_flat:.2f}s two_level={t_two:.2f}s k_total={k_total}")


def main() -> None:
    import __spark_entry__ as entry_mod
    from hpaste_spark import get_spark

    spark = get_spark("scale-probe")
    qs = entry_mod.queries()

    if "--train" in sys.argv:
        i = sys.argv.index("--train")
        factor = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit() else 30
        train_probe(spark, factor)
        spark.stop()
        return

    if "--gate" in sys.argv:
        i = sys.argv.index("--gate")
        factor = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit() else 30
        gate_probe(spark, factor)
        spark.stop()
        return

    if "--streaming" in sys.argv:
        i = sys.argv.index("--streaming")
        factor = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit() else 30
        stream_probe(spark, qs, factor)
        spark.stop()
        return

    if "--hundred" in sys.argv:
        # 100× rows for an explicit subset: --hundred name1,name2[,...]
        i = sys.argv.index("--hundred")
        names = sys.argv[i + 1].split(",")
        subset_probe(
            spark, qs, 100, names, HUNDRED_MARK,
            "100× probe — sub-document batch past the 30× regime",
        )
        spark.stop()
        return

    if "--big" in sys.argv:
        i = sys.argv.index("--big")
        factor = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit() else 30
        big_probe(spark, qs, factor)
        spark.stop()
        return

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
