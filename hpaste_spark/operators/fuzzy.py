"""Fuzzy string matching — approximate joins on edit distance.

The entity-resolution / data-cleaning primitive (near-identical names,
typo'd identifiers, OCR noise) the reference's byte-exact rowkey model
cannot express.  The scale shape mirrors this repo's LSH family: block
with an EQUI-join on derived keys, verify candidates with the exact
metric — never an n² nested loop with a distance predicate.

Blocking here is the FastSS / SymSpell deletion neighborhood: each
string emits itself plus every single-character deletion.  For edit
distance ≤ 1 this blocking is LOSSLESS (a substitution pair shares the
deletion at the edited position; an insertion/deletion pair shares the
shorter string itself), so unlike n-gram blocking there is no recall
caveat in the contract — the blocked join computes exactly the
distance-≤1 pair set.  Keys per string = len+1, so the exploded table
is ~|corpus|·len rows and candidates are bounded by true near-match
structure, not by vocabulary skew (a char-n-gram block on a clustered
name space degenerates toward all-pairs; deletion keys don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: F.Column) -> F.Column:
    """The FastSS k=1 key set: the string itself plus every
    one-character deletion (distinct)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))
        ),
    )
    return F.array_distinct(F.concat(F.array(col), dels))


def edit_distance_pairs(
    df: DataFrame,
    col: str = "name",
    id_col: str = "id",
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein ≤ ``max_dist`` (≤ 1 —
    the lossless deletion-blocking regime) → (id_a, id_b, dist).

    Shape: explode deletion keys → ONE equi-join on the key → distinct
    candidate pairs → exact ``levenshtein`` verify (a JVM expression).
    A deletion-key collision already implies distance ≤ 2, so the
    verify filter discards few rows; the plan never contains a
    cartesian or an inequality join.
    """
    if max_dist > 1:
        raise ValueError(
            "deletion blocking is lossless only for max_dist <= 1; "
            "chain merges or use n-gram blocking for larger radii"
        )
    # internal aliases must differ from the caller's column names, or
    # re-referencing `col` inside the same select resolves as a lateral
    # alias (internal analyzer error under Generate)
    s_al = "_s" if col not in ("_s", "_k") else "_s__fz"
    k_al = "_k" if col not in ("_k",) and id_col != "_k" else "_k__fz"
    keyed = df.select(
        F.col(id_col), F.col(col).alias(s_al), F.explode(deletion_keys(F.col(col))).alias(k_al)
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, F.col(f"a.{k_al}") == F.col(f"b.{k_al}"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{s_al}").alias("_sa"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{s_al}").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("_sa"), F.col("_sb")))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_match_counts(
    df: DataFrame,
    col: str = "name",
    id_col: str = "id",
    max_dist: int = 1,
) -> DataFrame:
    """Per-string near-match profile — (id, n_exact, n_near): how many
    OTHER strings sit at distance 0 (exact duplicates) and at
    1..max_dist.

    Scale shape: DEDUPE-THEN-JOIN.  The materialized pair set is
    quadratic inside duplicate clusters (k copies of a name = k² pairs
    — 37 s vs 2 s at bench scale on a clustered name space), but the
    near-match STRUCTURE lives entirely on distinct strings: with
    multiplicity m(name),

      n_exact(id with name a) = m(a) - 1
      n_near(id with name a)  = Σ over distinct b at distance 1..k of m(b)

    so the deletion-key join runs on the vocabulary-sized distinct-name
    table, weights fold in one agg, and the corpus is touched only by
    the name-count agg and the final profile attach (broadcast-sized).
    """
    names = df.groupBy(col).agg(F.count(F.lit(1)).alias("_m"))
    # the name doubles as its own pair id; `concat` breaks the
    # attribute identity so the self-join doesn't alias one attr twice
    # (which trips Spark's resolver with an internal error)
    pairs = edit_distance_pairs(
        names.select(F.concat(F.col(col)).alias("_nid"), F.col(col).alias("_s")),
        col="_s",
        id_col="_nid",
        max_dist=max_dist,
    )  # distinct names as their own ids; only dist >= 1 survives
    sym = pairs.select(F.col("id_a").alias(col), F.col("id_b").alias("_other")).unionAll(
        pairs.select(F.col("id_b").alias(col), F.col("id_a").alias("_other"))
    )
    near = (
        sym.join(
            names.select(F.col(col).alias("_other"), F.col("_m").alias("_mo")), "_other"
        )
        .groupBy(col)
        .agg(F.sum("_mo").alias("_near"))
    )
    prof = names.join(near, col, "left").select(
        col,
        (F.col("_m") - 1).cast("long").alias("n_exact"),
        F.coalesce("_near", F.lit(0)).cast("long").alias("n_near"),
    )
    return df.select(id_col, col).join(prof, col).select(id_col, "n_exact", "n_near")
