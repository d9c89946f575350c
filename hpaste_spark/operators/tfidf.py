"""Corpus-statistics text mining: TF-IDF term salience and corpus
n-gram counts — the "what is this corpus made of" primitives of a
training-data pipeline (keyword extraction, boilerplate detection,
domain mixing diagnostics).

Distributed shape, and why it holds at 100 TB:

- Everything is explode → hash-agg → equi-join on the term: the only
  shuffles are keyed by (doc, term) / term, all with map-side partial
  aggregation.  Hot terms ("the") are join keys with ONE row on the
  document-frequency side, so the join fans nothing out.
- The corpus size N is attached as a broadcast 1-row aggregate (the
  attach-a-constant plan), never collected to the driver.
- No floating-point ordering hazards: scores are ROUNDED (6 dp) before
  ranking and ties break on the term string, so top-k is stable across
  partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpaste_spark.functions.text import tokens


def doc_term_freq(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc, term, tf) — whitespace tokens, one hash-agg."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k most salient terms per document by smoothed TF-IDF:
    ``tf * (ln((N+1)/(df+1)) + 1)`` — the sklearn-style smooth idf, so
    a term in every doc still gets positive weight and df=0 can't
    divide by zero.

    Returns (doc_id, term, score, rank), score rounded to 6 dp.
    """
    tf = doc_term_freq(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def corpus_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    top: int = 20,
) -> DataFrame:
    """Top corpus n-grams by total occurrence count (boilerplate and
    template phrases surface here first).  Pure integer counts — no
    fp anywhere — ordered by (count desc, ngram) so the top-k is
    bit-deterministic.  TakeOrdered top-k, never a global sort."""
    from hpaste_spark.functions.text import word_shingles

    return (
        df.select(F.explode(word_shingles(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(top)
    )
