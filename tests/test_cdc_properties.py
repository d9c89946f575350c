"""Property fuzz: dedup.cdc_chunks vs a pure-Python content-defined
chunking model on random token streams.

The model replays the exact cut rule (52-bit md5 prefix of the token
mod divisor == 0 ends a chunk), so any drift in the Spark expression
chain (hash slice, prefix-sum window, reassembly ordering) shows up
on adversarial inputs — repeated tokens, all-anchor streams, single
tokens.  Also pins the structural CDC guarantee the shift grader
measures statistically: a one-token prefix edit changes AT MOST the
first chunk."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.dedup import cdc_chunks

token = st.text(alphabet="abcde", min_size=1, max_size=4)
stream = st.lists(token, min_size=1, max_size=30)


def _model(toks: list[str], divisor: int) -> list[str]:
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % divisor == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(toks=stream, divisor=st.integers(min_value=2, max_value=5))
def test_cdc_chunks_match_python_model_and_prefix_locality(spark, toks, divisor):
    prefixed = ["zz"] + toks  # arbitrary edit; may or may not be an anchor
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(prefixed))],
        "doc_id long, text string",
    )
    out = cdc_chunks(df, divisor=divisor).collect()
    got = {1: {}, 2: {}}
    for r in out:
        got[r["doc_id"]][r["cpos"]] = (r["chunk"], r["n_tokens"])
    for doc_id, tk in ((1, toks), (2, prefixed)):
        want = _model(tk, divisor)
        assert [got[doc_id][i][0] for i in range(len(want))] == want
        assert len(got[doc_id]) == len(want)
        # n_tokens is the chunk's token count; reassembly is lossless
        assert all(
            got[doc_id][i][1] == len(want[i].split(" ")) for i in range(len(want))
        )
        assert " ".join(want) == " ".join(tk)

    # CDC locality: the prefix edit perturbs at most the FIRST chunk —
    # every original chunk except possibly chunks[0] survives verbatim
    orig = _model(toks, divisor)
    shifted = _model(prefixed, divisor)
    if len(orig) > 1:
        assert shifted[-(len(orig) - 1):] == orig[1:]
