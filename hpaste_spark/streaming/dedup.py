"""Streaming ingest-time deduplication — the micro-batch mirror of the
batch incremental LSH operator (operators/dedup.incremental_lsh_candidates).

The 100 TB ingest loop is: a standing corpus LSH index (band keys,
computed once and stored — the write-time-layout discipline of
sources/bucketed.py and similarity.build_ivf_index), and a document
STREAM whose every micro-batch must be checked against that index
before admission.  foreachBatch runs the exact batch operator per
micro-batch — same code path, hence identical semantics by
construction — so a pipeline can switch between batch backfills and
streaming ingest without changing dedup behavior.

The reference has no streaming (SURVEY §2.9); this extends the
beyond-parity streaming family (time windows, sessionization,
increments, as-of enrichment, stream-stream as-of).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def stream_incremental_dedup(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    sink: "Callable[[DataFrame, int], None]",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 3,
    max_bucket: int | None = None,
    timeout_s: int = 120,
):
    """Check each micro-batch of ``stream_docs`` against the standing
    ``corpus_bands`` LSH index; ``sink(candidates_df, batch_id)``
    receives the (batch_id, corpus_id, n_bands) candidate pairs.

    ``corpus_bands`` stays executor-resident across batches — persist
    it at the call site for repeated reuse (at scale it is a stored
    table read, so each batch's join is a broadcast-batch-side or
    shuffle equi-join on the band key, never a corpus rescan).
    """
    from hpaste_spark.operators.dedup import incremental_lsh_candidates

    def check(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_lsh_candidates(
            corpus_bands,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle=shingle,
            max_bucket=max_bucket,
        )
        sink(out, batch_id)

    q = (
        stream_docs.writeStream.foreachBatch(check)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # returning with the query live would hand the caller a
        # silently-incomplete candidate set while foreachBatch keeps
        # firing in the background
        q.stop()
        raise TimeoutError(
            f"stream_incremental_dedup did not drain within {timeout_s}s"
        )
    return q
