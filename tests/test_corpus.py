"""operators/corpus.py — chunking, vocabulary stats, PII redaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpaste_spark.operators.corpus import (
    chunk_documents,
    doc_length_histogram,
    redact_pii,
    vocab_coverage,
)


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_chunk_overlap_covers_every_token_with_context(spark):
    toks = [f"t{i}" for i in range(10)]
    out = chunk_documents(_doc(spark, " ".join(toks)), chunk_size=4, overlap=2).collect()
    by_idx = {r["chunk_idx"]: r["chunk_text"].split() for r in out}
    # starts every (4-2)=2 tokens: 0,2,4,6,8 — last chunk short, not dropped
    assert sorted(by_idx) == [0, 1, 2, 3, 4]
    assert by_idx[0] == ["t0", "t1", "t2", "t3"]
    assert by_idx[1] == ["t2", "t3", "t4", "t5"], "overlap region repeats for context"
    assert by_idx[4] == ["t8", "t9"], "trailing chunk emitted short"
    covered = {t for c in by_idx.values() for t in c}
    assert covered == set(toks), "every token belongs to at least one chunk"


def test_chunk_short_doc_is_one_chunk(spark):
    out = chunk_documents(_doc(spark, "only three tokens"), chunk_size=128, overlap=32).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0 and out[0]["n_tokens"] == 3


def test_chunk_rejects_degenerate_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, "a b"), chunk_size=4, overlap=4)


def test_vocab_coverage_is_monotone_and_ends_at_one(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    rows = sorted(vocab_coverage(df, top_n=10).collect(), key=lambda r: r["rank"])
    assert [r["token"] for r in rows] == ["a", "b", "c"]
    assert [r["cnt"] for r in rows] == [3, 2, 1]
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs) and covs[-1] == pytest.approx(1.0)


def test_length_histogram_bins_and_fractions(spark):
    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 10, 40, 70])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["min_tokens"]: (r["n_docs"], r["frac"]) for r in doc_length_histogram(df, bin_width=32).collect()}
    assert out == {0: (2, 0.5), 32: (1, 0.25), 64: (1, 0.25)}


def test_redact_pii_recall_and_false_positive_guard(spark):
    df = spark.createDataFrame(
        [
            (1, "contact john.doe+spam@example.co.uk for details"),
            (2, "server at 192.168.1.250 responded"),
            (3, "call +1 555 867 5309 now"),
            (4, "perfectly clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_redactions"] == 1 and "[EMAIL]" in out[1]["redacted_text"]
    assert "example.co.uk" not in out[1]["redacted_text"]
    assert out[2]["n_redactions"] == 1 and "192.168" not in out[2]["redacted_text"]
    assert out[3]["n_redactions"] == 1 and "5309" not in out[3]["redacted_text"]
    assert out[4]["n_redactions"] == 0
    assert out[4]["redacted_text"] == "perfectly clean text with no identifiers at all", (
        "clean text must pass through byte-identical (false-positive guard)"
    )


def test_unigram_logprob_head_vs_oov_and_exact_value(spark):
    """Vocab tokens score cnt/N; OOV floors at 1/N.  With vocab_size=1
    only the most frequent token is in-model, everything else OOV."""
    import math

    from hpaste_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    # counts: a=3, b=2, c=1, N=6; vocab_size=1 -> model = {a: 3/6}
    out = {r["doc_id"]: (r["n_tokens"], r["logprob"]) for r in
           unigram_logprob(df, vocab_size=1).collect()}
    exp1 = round(-(3 * math.log(3 / 6) + math.log(1 / 6)) / 4, 4)
    exp2 = round(-(2 * math.log(1 / 6)) / 2, 4)
    assert out[1] == (4, exp1)
    assert out[2] == (2, exp2)


def test_repeated_ngram_spans_counts_and_short_doc_guard(spark):
    """Docs shorter than n yield no spans; a span repeated within ONE
    doc doesn't qualify (min_docs counts distinct docs), and occurrence
    counts include within-doc repeats for qualifying spans."""
    from hpaste_spark.operators.dedup import repeated_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "x y z w"),            # shares "x y z" with doc 2
            (2, "x y z q x y z"),      # "x y z" twice within doc 2
            (3, "solo solo solo solo solo"),  # repeats only within itself
            (4, "ab"),                 # shorter than n -> no spans
        ],
        "doc_id long, text string",
    )
    out = {r["shingle"]: (r["n_docs"], r["n_occurrences"]) for r in
           repeated_ngram_spans(df, n=3, min_docs=2).collect()}
    assert out == {"x y z": (2, 3)}


def test_bpe_train_merges_hand_corpus_and_overlap_semantics(spark):
    """Hand-checkable BPE: overlapping pairs COUNT both occurrences but
    merge greedily leftmost ('aaa' -> (aa)(a)); later rounds see merged
    symbols; training stops early when no pairs remain."""
    from hpaste_spark.operators.corpus import bpe_train_merges

    df = spark.createDataFrame([(1, "aaa aaa ba")], "doc_id long, text string")
    # words: aaa(wc2), ba(wc1).  r1 pairs: (a,a)=4 (2 per 'aaa', x2), (b,a)=1
    #   -> merge1 (a,a,'aa',4); 'aaa' becomes (aa)(a)
    # r2 pairs: (aa,a)=2, (b,a)=1 -> merge2 (aa,a,'aaa',2)
    # r3 pairs: (b,a)=1 -> merge3; r4: none -> stop at 3 rows
    rows = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert rows == [
        (1, "a", "a", "aa", 4),
        (2, "aa", "a", "aaa", 2),
        (3, "b", "a", "ba", 1),
    ]


def test_bpe_segment_words_matches_merge_sequence(spark):
    """Segmentation is the train loop's final state: after merges
    (a,a)->(aa) then (aa,a)->(aaa), 'aaa' is one symbol and 'ba' stays
    two chars until its own merge lands."""
    from hpaste_spark.operators.corpus import bpe_segment_words

    df = spark.createDataFrame([(1, "aaa aaa ba")], "doc_id long, text string")
    out = {r["w"]: (r["wc"], r["n_syms"], r["segmentation"]) for r in
           bpe_segment_words(df, n_merges=2).collect()}
    assert out == {"aaa": (2, 1, "aaa"), "ba": (1, 2, "b a")}
