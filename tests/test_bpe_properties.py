"""Property fuzz: corpus.bpe_train_merges / bpe_segment_words vs a
pure-Python BPE reference model on random small corpora.

The model implements textbook BPE over the word-frequency dict:
overlapping pairs all counted, argmax ties broken on (lhs, rhs),
greedy leftmost non-overlapping merge per round.  Any divergence in
counting, tie-breaks, or merge application shows up immediately on
adversarial tiny vocabularies (single letters, repeats)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpaste_spark.operators.corpus import bpe_segment_words, bpe_train_merges

word = st.text(alphabet="abc", min_size=1, max_size=6)
corpus = st.lists(word, min_size=1, max_size=25)


def _model(words: list[str], n_merges: int):
    from collections import Counter

    wc = Counter(words)
    state = {w: tuple(w) for w in wc}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # max total, ties -> smallest (lhs, rhs)
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), total = best
        merges.append((rank, lhs, rhs, lhs + rhs, total))
        new_state = {}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, {w: state[w] for w in wc}, wc


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(words=corpus, n_merges=st.integers(min_value=1, max_value=4))
def test_bpe_matches_python_model(spark, words, n_merges):
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    want_merges, want_seg, wc = _model(words, n_merges)

    got_merges = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    assert got_merges == want_merges

    got_seg = {
        r["w"]: (r["wc"], tuple(r["segmentation"].split(" ")))
        for r in bpe_segment_words(df, n_merges=n_merges).collect()
    }
    assert got_seg == {w: (wc[w], syms) for w, syms in want_seg.items()}
