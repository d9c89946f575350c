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
