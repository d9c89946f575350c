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
    keyed = df.select(
        F.col(id_col), F.col(col).alias("_s"), F.explode(deletion_keys(F.col(col))).alias("_k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, F.col("a._k") == F.col("b._k"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a._s").alias("_sa"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b._s").alias("_sb"),
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
    OTHER strings sit at distance 0 (exact duplicates) and at 1..max_dist.
    The bounded-output diagnostic view of :func:`edit_distance_pairs`
    (pair sets grow quadratically inside duplicate clusters; the per-id
    rollup stays |corpus|-sized)."""
    pairs = edit_distance_pairs(df, col, id_col, max_dist)
    both = pairs.select(F.col("id_a").alias(id_col), "dist").unionAll(
        pairs.select(F.col("id_b").alias(id_col), "dist")
    )
    counts = both.groupBy(id_col).agg(
        F.sum(F.when(F.col("dist") == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.sum(F.when(F.col("dist") > 0, 1).otherwise(0)).cast("long").alias("n_near"),
    )
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_near", F.lit(0)).alias("n_near"),
        )
    )
