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


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by Okapi BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the non-negative
    variant).  Returns (doc_id, score, rank).

    Distributed shape: term-frequency and document-length come from the
    SAME (doc, term, tf) hash-agg; the query-term filter cuts the
    scored side to |query| rows per matching doc BEFORE the length
    join, and document frequencies + corpus stats ride in as broadcast
    aggregates.  Top-k plans as TakeOrderedAndProject (never a global
    sort); the rank window runs over the <= k survivors only.

    Cross-engine stability: each term's contribution is rounded to
    6 dp before the per-doc sum, and the summed score to 4 dp before
    ranking, with a doc-id tie-break — so last-ulp double-addition
    order cannot flip the top-k between engines.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    tf = doc_term_freq(df, text_col, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    matched = tf.filter(F.col("term").isin(terms))
    dfreq = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = F.round(
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_pair, pmi) — pointwise mutual information of adjacent
    word pairs: ``ln( p(w1,w2) / (p(w1)·p(w2)) )`` — the collocation /
    multi-word-expression detector ("new york" scores high, "of the"
    near zero).  ``min_count`` drops unstable rare pairs (PMI's known
    low-frequency bias).

    Shape: one token explode → unigram hash-agg, one bigram explode →
    pair hash-agg, totals as broadcast one-row aggregates, two
    unigram-keyed joins onto the (much smaller) surviving pair table.
    PMI rounded to 6 dp."""
    from hpaste_spark.functions.text import tokens, word_shingles

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("_cu"))
    t_tok = uni.agg(F.sum("_cu").cast("double").alias("_tt"))
    bi = df.select(F.explode(word_shingles(F.col(text_col), 2)).alias("bg"))
    pairs = (
        bi.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    t_bi = bi.agg(F.count(F.lit(1)).cast("double").alias("_tb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("_cu").alias("_c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("_cu").alias("_c2"))
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t_bi))
        .crossJoin(F.broadcast(t_tok))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("_tb"))
                    / ((F.col("_c1") / F.col("_tt")) * (F.col("_c2") / F.col("_tt")))
                ),
                6,
            ).alias("pmi"),
        )
    )
