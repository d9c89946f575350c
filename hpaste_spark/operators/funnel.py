"""Ordered-step funnels and cohort retention over event streams.

Product analytics over the ``events`` table: "of the users who VIEWED,
how many then CLICKED, and then PURCHASED — in that order?" and "of
the users whose first event fell in week W, how many were still active
k weeks later?".  The reference has no analytics DSL (HPaste stops at
scans + MR aggregation, mapreduce2.scala:277); these are the
grouped-fold shapes its job framework would express as a secondary-sort
reducer (OpsResult-style per-user ordered replay), re-expressed here as
one Spark shuffle plus a JVM array fold.

Scale shape (funnel): ONE shuffle — ``groupBy(user)`` with
``sort_array(collect_list(struct(ts, type)))`` — then a per-user
``F.aggregate`` fold entirely inside whole-stage codegen, then a single
reduced global aggregate for the step counts.  The k-step chain does
NOT become k self-joins (the naive SQL formulation); state per user is
a k-long epoch-micros array.  Per-user event counts bound the list
size — user activity histories, not corpus-wide lists.

Scale shape (retention): two hash aggregations keyed on user / (cohort,
period) — both map-side partial — and one equi-join of per-user firsts
back onto the distinct activity grid.  The cohort base sizes re-join
from the offset-0 slice of the same aggregate (broadcast-sized: one row
per cohort), never a second scan of the raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpaste_spark.functions.timeutil import epoch_us

_UNSET = -1  # epoch-micros sentinel inside the fold accumulator


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_name, n_users, pct_of_first) — strictly-ordered
    funnel conversion.  A user counts for step i when an event of type
    ``steps[i]`` exists STRICTLY after their earliest qualifying
    step-(i-1) event (greedy-earliest matching, which is optimal: the
    earliest achievement of stage i-1 maximizes the window for stage
    i, so the fold and the min-chain SQL formulation agree).
    Same-timestamp events never chain (strict ``>``).
    ``pct_of_first`` is rounded to 2 dp; 0-user funnels report 0.0.
    """
    steps = list(steps)
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError("funnel needs >= 2 distinct step names")
    k = len(steps)
    ev = events.select(
        F.col(user_col).alias("_u"),
        epoch_us(F.col(ts_col)).alias("_ts"),
        F.col(type_col).alias("_tp"),
    ).filter(F.col("_tp").isin(steps))
    per_user = ev.groupBy("_u").agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_tp"))).alias("_evs")
    )

    init = F.array(*[F.lit(_UNSET).cast("long") for _ in range(k)])

    def _merge(acc, e):
        ets, etp = e["_ts"], e["_tp"]
        out = []
        for i, s in enumerate(steps):
            cond = (acc[i] == F.lit(_UNSET)) & (etp == F.lit(s))
            if i > 0:
                cond = cond & (acc[i - 1] != F.lit(_UNSET)) & (ets > acc[i - 1])
            out.append(F.when(cond, ets).otherwise(acc[i]))
        return F.array(*out)

    folded = per_user.select(F.aggregate("_evs", init, _merge).alias("_acc"))
    # coalesce: SUM over an empty frame is NULL — a funnel nobody ever
    # entered must report 0 users per step, not NULL (fuzz-caught)
    counts = folded.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("_acc")[i] != _UNSET, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"_n{i}")
            for i in range(k)
        ]
    )
    # unpivot via inline() over TYPED literals, not a stack(...) SQL
    # string — caller-supplied step names never touch a parser, so a
    # quote (or anything else) in a step name can't break or inject
    rows = counts.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(steps[i]).alias("step_name"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i in range(k)
                ]
            )
        ),
        F.col("_n0").alias("_first"),
    )
    return rows.select(
        F.col("step").cast("int").alias("step"),
        "step_name",
        "n_users",
        F.round(
            F.when(F.col("_first") > 0, F.col("n_users") * 100.0 / F.col("_first"))
            .otherwise(F.lit(0.0)),
            2,
        ).alias("pct_of_first"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """(cohort_period, period_offset, n_active, retention_pct) — users
    bucketed by the period of their FIRST event; a (cohort, offset)
    cell counts users from that cohort active ``offset`` periods later.
    Periods are absolute epoch buckets (``epoch_us // (days*86400e6)``)
    so the bucketing is a pure narrow projection on both engines.
    ``retention_pct`` = 100 * n_active / cohort size (offset-0 count),
    rounded to 2 dp; offset 0 is always 100.0 by construction.
    """
    if period_days <= 0:
        raise ValueError("period_days must be positive")
    us = int(period_days) * 86_400 * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.floor(epoch_us(F.col(ts_col)) / F.lit(us)).cast("long").alias("_p"),
    )
    firsts = ev.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    active = ev.distinct()
    grid = (
        active.join(firsts, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).alias("period_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    base = grid.filter(F.col("period_offset") == 0).select(
        F.col("cohort_period").alias("_c"), F.col("n_active").alias("_base")
    )
    return (
        grid.join(F.broadcast(base), grid["cohort_period"] == base["_c"])
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            F.round(F.col("n_active") * 100.0 / F.col("_base"), 2).alias(
                "retention_pct"
            ),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """(from_type, to_type, n_transitions) — the first-order Markov
    transition counts of adjacent events within each user's timeline.
    One user-keyed window (lead) and one tiny hash-agg keyed by the
    |types|² pair space; a user's final event has no successor and
    contributes nothing.  Pass a unique ``tiebreak_cols`` (e.g.
    ``["event_id"]``) to make same-timestamp adjacency deterministic —
    same contract as groups.sessionize."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, *(tiebreak_cols or []))
    nxt = F.lead(type_col).over(w)
    return (
        events.withColumn("_next", nxt)
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("_next").alias("to_type")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def time_to_conversion(
    events: DataFrame,
    from_step: str,
    to_step: str,
    bucket_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(bucket, n_users) — histogram of the latency from a user's first
    ``from_step`` event to their first ``to_step`` event STRICTLY after
    it (the time-to-convert / survival-curve substrate; bucket =
    floor(latency / bucket_hours), so bucket 0 is "converted within the
    first period").  Users who never convert are absent — a survival
    analysis joins this against the funnel base count.  Two user-keyed
    min-aggregates (the second filtered by the first's timestamp via an
    equi-join on the user), then one tiny bucket hash-agg."""
    if bucket_hours <= 0:
        raise ValueError("bucket_hours must be positive")
    us = int(bucket_hours) * 3_600 * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        epoch_us(F.col(ts_col)).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    first_a = (
        ev.filter(F.col("_tp") == from_step)
        .groupBy("_u")
        .agg(F.min("_ts").alias("_ta"))
    )
    conv = (
        ev.filter(F.col("_tp") == to_step)
        .join(first_a, "_u")
        .filter(F.col("_ts") > F.col("_ta"))
        .groupBy("_u")
        .agg(F.min(F.col("_ts") - F.col("_ta")).alias("_lat"))
    )
    return (
        conv.groupBy(F.floor(F.col("_lat") / F.lit(us)).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """(path, n_sessions) — the ``top`` most common within-session
    event-type sequences ('view>click>purchase'), the "how do users
    actually move" diagnostic over gap-based sessions.

    Composes groups.sessionize (lag window + running sum) with ONE
    (user, session) hash-agg whose ordering is made deterministic the
    same way funnel_counts is: ``sort_array(collect_list(struct(ts,
    tiebreaks..., type)))`` — collect_list order is
    partition-arrival-dependent, the sorted struct array is not.  The
    head is (count desc, path) TakeOrdered top-k, never a global
    sort."""
    from hpaste_spark.operators.groups import sessionize

    tiebreaks = list(tiebreak_cols or [])
    sess = sessionize(
        events, user_col, ts_col, gap_minutes=gap_minutes, tiebreak_cols=tiebreaks
    )
    ordered = F.sort_array(
        F.collect_list(
            F.struct(F.col(ts_col), *[F.col(c) for c in tiebreaks], F.col(type_col))
        )
    )
    paths = (
        sess.groupBy(user_col, "session_idx")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s[type_col]), ">"
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(top)
    )
    return paths
