"""Corpus-preparation operators: chunking, vocabulary statistics, and
PII redaction — the remaining pre-training data-pipeline stages between
cleaning/dedup (operators/dedup.py) and packing (operators/sampling.py).

The reference has no analog (its values are opaque bytes transformed in
arbitrary mappers, e.g. WebCrawlSchemaTest.scala:39); these are the
LLM-pipeline extensions SURVEY §6 scopes as first-class.  All hot-path
logic is JVM-side array/regexp expressions — no Python UDFs — and every
formula has a line-for-line DuckDB twin in the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpaste_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Sliding-window token chunking: (doc_id, chunk_idx, n_tokens,
    chunk_text) rows with chunks of ``chunk_size`` tokens starting every
    ``chunk_size - overlap`` tokens (the context-window prep step that
    turns documents into trainable sequences while preserving
    cross-boundary context in the overlap).

    Shape: tokenize → per-row array expression building every chunk
    (start offsets are a ``sequence`` with step, chunks are ``slice``
    projections of the one token array) → posexplode.  Zero shuffles,
    zero UDFs; a 100 TB corpus chunks in a single narrow map stage.
    The trailing chunk is emitted short rather than dropped (training
    pipelines pad it), so every token belongs to ≥1 chunk.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    carry = list(carry_cols)
    return (
        df.filter(F.size(toks) > 0)
        .select(F.col(id_col), *carry, F.posexplode(chunks).alias("chunk_idx", "_chunk"))
        .select(
            id_col,
            *carry,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("_chunk").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        )
    )


def _token_stats(df: DataFrame, text_col: str) -> "tuple[DataFrame, DataFrame]":
    """(counts, total): the distinct-type count table (one hash-agg,
    map-side combined) and the single-row corpus token total — the ONE
    definition of the vocabulary substrate shared by
    :func:`vocab_coverage`, :func:`encode_tokens` (via vocab_coverage),
    and :func:`unigram_logprob`, so tokenization and tie-break changes
    can never diverge between them."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return counts, total


def _vocab_head(counts: DataFrame, top_n: int) -> DataFrame:
    """Distributed top-k of the type table (TakeOrderedAndProject —
    per-partition top-k merge, never a global sort); ties break on the
    token string so ranks are engine-stable."""
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_n)


#: vocab_coverage's single-row cumsum fold copies the accumulated array
#: per element (O(top_n²) element copies); past this bound the fold is
#: no longer "trivial on one row" and the operator refuses rather than
#: degrade (use encode/logprob heads directly, or a two-level cumsum)
MAX_VOCAB_FOLD = 65536


def vocab_coverage(
    df: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the ``top_n`` most frequent tokens with
    rank and cumulative coverage fraction — the tokenizer-training /
    vocabulary-sizing primitive ("how many types cover 90 % of
    tokens?").

    Shape: explode tokens → one hash-agg (map-side combine collapses
    each partition to its distinct types before the shuffle) → the
    top_n head is taken with ``orderBy(...).limit(top_n)``, which Spark
    plans as TakeOrderedAndProject — a distributed per-partition top-k
    merge, never a global sort of the full type table.  Rank and the
    coverage cumsum then run as a single-row array fold (``array_sort``
    → one O(n) ``aggregate``) over only the ≤top_n surviving entries,
    so the plan contains NO WindowExec at all: the unbounded type table
    (10⁷–10⁸ types on a web corpus) is never moved to one partition.
    Ordering ties break on the token string so ranks are engine-stable.
    The fold copies its accumulator per element — O(top_n²) element
    copies on one row — so ``top_n`` is bounded by ``MAX_VOCAB_FOLD``
    (65536 ≈ sub-second; the operator raises past it rather than
    silently degrade).
    """
    if top_n > MAX_VOCAB_FOLD:
        raise ValueError(
            f"top_n={top_n} exceeds MAX_VOCAB_FOLD={MAX_VOCAB_FOLD}: the "
            "single-row cumsum fold is O(top_n²); use the un-cumsum'd "
            "_vocab_head for larger vocabularies"
        )
    counts, total = _token_stats(df, text_col)
    head = _vocab_head(counts, top_n)
    # ascending struct sort on (-cnt, token) == (cnt desc, token asc)
    sorted_arr = F.array_sort(
        F.collect_list(
            F.struct(
                (-F.col("cnt")).alias("_neg"),
                F.col("token").alias("token"),
                F.col("cnt").alias("cnt"),
            )
        )
    )
    fold_zero = F.expr(
        "named_struct('cum', 0L, "
        "'out', cast(array() as array<struct<token:string,cnt:bigint,cum:bigint>>))"
    )
    folded = head.agg(sorted_arr.alias("_arr")).select(
        F.aggregate(
            "_arr",
            fold_zero,
            lambda acc, x: F.struct(
                (acc["cum"] + x["cnt"]).alias("cum"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["token"].alias("token"),
                            x["cnt"].alias("cnt"),
                            (acc["cum"] + x["cnt"]).alias("cum"),
                        )
                    ),
                ).alias("out"),
            ),
        )["out"].alias("_out")
    )
    return (
        folded.select(F.posexplode("_out").alias("pos", "s"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("s.token").alias("token"),
            F.col("s.cnt").alias("cnt"),
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.round(F.col("s.cum") / F.col("_total"), 6).alias("coverage"),
        )
    )


def doc_length_histogram(
    df: DataFrame,
    bin_width: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-length histogram: documents bucketed by ``n_tokens div
    bin_width`` with count and corpus fraction — the length-distribution
    diagnostic behind truncation/packing decisions.  Integer binning
    (never float log buckets) keeps bucket edges bit-identical across
    engines."""
    from pyspark.sql import Window

    n = F.size(tokens(F.col(text_col)))
    binned = df.select((n.cast("long") / bin_width).cast("long").alias("bin"), F.col(id_col))
    # the corpus total is an unpartitioned window over the bin-count
    # aggregate (sum of per-bin counts = row total) — a broadcast-agg
    # crossJoin here ran the corpus tokenize+bin pass twice
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            (F.col("bin") * bin_width).alias("min_tokens"),
            F.col("n_docs"),
            F.round(F.col("n_docs") / total, 6).alias("frac"),
        )
    )


def encode_tokens(
    df: DataFrame,
    vocab_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer application: encode each document's tokens against the
    corpus-frequency vocabulary head (:func:`vocab_coverage` ranks; OOV
    → id 0) — (doc_id, n_tokens, n_oov, ids as JSON).

    Shape: the vocabulary is |V| rows — broadcast — so encoding is
    posexplode → broadcast hash join → one (doc) hash-agg re-collecting
    ids in position order.  The corpus never shuffles by token; the only
    exchange is the per-doc regroup, and at 100 TB the vocab build
    itself (one hash-agg) is the cheap step.
    """
    vocab = vocab_coverage(df, top_n=vocab_size, text_col=text_col).select(
        "token", F.col("rank").alias("tok_id")
    )
    pos = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
    )
    enc = pos.join(F.broadcast(vocab), "token", "left").select(
        id_col, "pos", F.coalesce(F.col("tok_id"), F.lit(0)).alias("tok_id")
    )
    return (
        enc.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("tok_id") == 0, 1).otherwise(0)).alias("n_oov"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_id"))), lambda s: s["tok_id"]
            ).alias("_ids"),
        )
        .select(
            id_col,
            "n_tokens",
            F.col("n_oov").cast("long").alias("n_oov"),
            F.to_json(F.col("_ids")).alias("ids"),
        )
    )


#: symbol delimiters for the BPE state string: each symbol is stored as
#: \x01<sym>\x02, so a pair pattern \x01a\x02\x01b\x02 can only match
#: whole adjacent symbols (never a substring inside a longer symbol),
#: and left-to-right non-overlapping replace() IS the BPE greedy merge
_BPE_L = "\x01"
_BPE_R = "\x02"


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding merge training over the corpus — the
    vocabulary-induction step of a tokenizer pipeline.  Returns the
    learned merge table (merge_rank, lhs, rhs, merged, pair_count),
    rank 1 = first merge.

    Classic BPE trains on the WORD-FREQUENCY dictionary, not the raw
    corpus: one pass collapses the corpus to (distinct word, count) —
    Zipf makes this table tiny relative to 100 TB of text — then each
    merge round is (a) one hash-agg counting adjacent symbol pairs
    weighted by word count, (b) a 1-row argmax collect (ties break on
    the pair strings, engine-stable), (c) a literal string replace
    applying the merge.  Symbols live delimiter-wrapped in one string
    per word (see ``_BPE_L``) so the merge is a plain non-overlapping
    ``replace`` — the exact semantics the DuckDB oracle replays.  Each
    round's state is persisted and the PREVIOUS round's cache released
    as soon as the new state is materialized (localCheckpoint blocks
    would outlive the call and survive clearCache(), leaking executor
    storage per invocation); the merge table is driver-built, so the
    final state cache is released before returning too.

    Like the reference's chained-MR jobs (SURVEY §3.3) this is an
    iterative driver-coordinated pipeline: the per-round collect is ONE
    row (the argmax), never data.
    """
    merges, state = _bpe_loop(df, n_merges, text_col)
    state.unpersist()
    out_schema = "merge_rank long, lhs string, rhs string, merged string, pair_count long"
    return df.sparkSession.createDataFrame(merges, out_schema)


def _bpe_syms(s_col: F.Column) -> F.Column:
    """Symbol array from the delimiter-wrapped state string."""
    return F.split(s_col.substr(F.lit(2), F.length(s_col) - 2), _BPE_R + _BPE_L)


def _bpe_loop(df: DataFrame, n_merges: int, text_col: str):
    """The shared BPE training loop: returns (merge rows, final word
    state).  The returned state DataFrame is PERSISTED — the caller
    must unpersist it."""
    from hpaste_spark.functions.text import tokens as _tokens

    words = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
    )
    wrapped = F.aggregate(
        chars, F.lit(""), lambda acc, c: F.concat(acc, F.lit(_BPE_L), c, F.lit(_BPE_R))
    )
    # memory-rule note (SCALE.md, round 11): this per-round persist is
    # DELIBERATELY memory-first, unlike the graph/k-center DISK_ONLY
    # cuts, because the state here is NOT corpus-sized — it is the
    # DISTINCT-WORD dictionary (w, wc, s), which Zipf truncates to the
    # vocabulary size (≈ 10⁵-10⁶ rows at any corpus scale, growing
    # ~log-like, not linearly, with corpus bytes).  A dimension-sized
    # table is exactly what the rule says cache is FOR; the release
    # discipline below (unpersist prev as soon as the next round's
    # state materializes) bounds it to one copy.
    state = words.select("w", "wc", wrapped.alias("s")).persist()

    merges = []
    prev = None
    for k in range(n_merges):
        syms = _bpe_syms(F.col("s"))
        pairs = state.select(
            "wc",
            F.explode(
                # slice BOTH sides to size-1: zip_with pads the shorter
                # array with nulls, so a 1-symbol word would otherwise
                # emit a (char, null) pair
                F.zip_with(
                    F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                    F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wc").alias("total"))
            .orderBy(F.col("total").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        # this collect just materialized `state`'s cache (the pair agg
        # reads through it), so the round-(k-1) cache it was built from
        # can be released now — one job per round, no extra count()
        if prev is not None:
            prev.unpersist()
        if not best:
            break
        lhs, rhs, total = best[0]["lhs"], best[0]["rhs"], best[0]["total"]
        merges.append((k + 1, lhs, rhs, lhs + rhs, int(total)))
        pat = _BPE_L + lhs + _BPE_R + _BPE_L + rhs + _BPE_R
        rep = _BPE_L + lhs + rhs + _BPE_R
        prev = state
        state = state.select(
            "w", "wc", F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s")
        ).persist()
    if prev is not None:
        prev.unpersist()  # the final round's parent; merges are baked
        # literals, so any recompute of the final state is narrow
    return merges, state


def bpe_segment_words(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """BPE APPLICATION: the corpus word dictionary segmented under the
    learned merges — (w, wc, n_syms, segmentation with symbols space-
    joined).  Train + apply in one pass: the training loop's final
    state IS the segmentation of every distinct word, so applying costs
    nothing beyond training (the corpus itself never re-tokenizes —
    encoding documents is then a broadcast join of this dictionary,
    exactly :func:`encode_tokens`'s shape).  The n_syms sum over wc is
    the post-BPE corpus token count — the compression diagnostic that
    drives vocabulary-size decisions."""
    _, state = _bpe_loop(df, n_merges, text_col)
    syms = _bpe_syms(F.col("s"))
    out = state.select(
        "w",
        "wc",
        F.size(syms).cast("long").alias("n_syms"),
        F.concat_ws(" ", syms).alias("segmentation"),
    )
    # safe to release immediately: the learned merges are baked into
    # the plan as LITERAL replace patterns, so recomputing `out` is one
    # word-count agg plus a chain of narrow replaces — no re-training
    state.unpersist(blocking=False)
    return out


def unigram_logprob(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean negative log
    probability under the corpus's own unigram model — (doc_id,
    n_tokens, logprob).  The CCNet/Gopher-style LM-filtering signal
    with the corpus itself standing in for the language model:
    boilerplate and natural text score low, gibberish and rare-token
    soup score high.

    Model: p(tok) = cnt(tok)/N for the ``vocab_size`` most frequent
    tokens (ties broken on the token string), floor 1/N for everything
    else — the head is the model, the tail is OOV, exactly the split a
    real tokenizer/LM deployment has.  score = round(-avg(ln p), 4).

    Shape: one token hash-agg → distributed top-k head
    (TakeOrderedAndProject, same as :func:`vocab_coverage` — the
    unbounded type table never single-partitions) broadcast to a
    posexplode → broadcast-join → per-doc hash-agg.  The corpus never
    shuffles by token; both corpus passes are narrow + one exchange
    each.
    """
    counts, total = _token_stats(df, text_col)
    vocab = _vocab_head(counts, vocab_size)
    pos = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    scored = (
        pos.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(F.coalesce(F.col("cnt"), F.lit(1)).cast("double") / F.col("_total")).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(-F.avg("_lp"), 4).alias("logprob"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame-level PII scrubbing — (doc_id, n_redactions,
    redacted_len, redacted_text) over the column functions
    :func:`hpaste_spark.functions.text.redact_pii` / ``pii_counts``
    (ONE pattern source; the patterns and the [EMAIL]/[IPV4]/[PHONE]
    replacement chain live there).

    Pure regexp chain: JVM-side, codegen, one narrow map stage at any
    scale.  On clean text the contract is exactness in the OTHER
    direction — zero false positives, output byte-identical to input —
    which is what the fixture-corpus oracle row checks; the
    synthetic-PII unit test checks recall.
    """
    from hpaste_spark.functions.text import PII_PATTERNS, pii_counts
    from hpaste_spark.functions.text import redact_pii as redact_col

    n = pii_counts(F.col(text_col))
    total = None
    for kind, _ in PII_PATTERNS:
        total = n[kind] if total is None else total + n[kind]
    redacted = redact_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_redactions"),
        F.length(redacted).cast("long").alias("redacted_len"),
        redacted.alias("redacted_text"),
    )


def gopher_gates(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition-free quality gates (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 quality filtering):
    the document-shape rules every large-corpus pipeline applies before
    any model-based scoring — word-count bounds, mean-word-length
    bounds, minimum fraction of words containing an alphabetic
    character, and a minimum stopword count (natural-language
    evidence).  Returns one row per doc with each measured signal, a
    per-gate boolean, and the conjunction ``passes`` — keep the signals
    rather than just the verdict so threshold sweeps are a filter, not
    a recompute.

    Every signal is a pure JVM expression over the whitespace token
    array (no UDF, no shuffle — a narrow projection at any scale);
    defaults are the paper's, tighten/loosen per corpus.
    """
    from hpaste_spark.functions.text import STOPWORDS, tokens

    t = tokens(F.col(text_col))
    n = F.size(t)
    total_len = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    mean_len = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    g_words = (n >= min_words) & (n <= max_words)
    g_len = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    g_alpha = alpha_ratio >= min_alpha_ratio
    g_stop = n_stop >= min_stopwords
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        g_words.alias("gate_word_count"),
        g_len.alias("gate_mean_word_len"),
        g_alpha.alias("gate_alpha_ratio"),
        g_stop.alias("gate_stopwords"),
        (g_words & g_len & g_alpha & g_stop).alias("passes"),
    )


def bigram_backoff_logprob(
    df: DataFrame,
    vocab_size: int = 1000,
    min_bigram_count: int = 2,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram Stupid-Backoff LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation"): per-document mean negative
    log score of each token given its predecessor — (doc_id, n_bigrams,
    logprob) — the next step up from :func:`unigram_logprob` on the
    CCNet/KenLM quality-filter ladder, sensitive to word ORDER where
    the unigram model only sees the bag.

    Model, trained on the scored corpus itself: S(w|prev) =
    cnt(prev,w)/cnt(prev·) when the bigram survives pruning
    (``min_bigram_count``, the standard count-pruning a deployed KenLM
    applies), else ``alpha``·p_uni(w) with the same top-``vocab_size``
    + 1/N-floor unigram as :func:`unigram_logprob`.  Pruning is what
    makes backoff REAL here: singleton bigrams fall through to the
    unigram path exactly like unseen test bigrams would.

    Shape: doc bigrams are a narrow array expression (token array
    materialized once per row, two-arg transform lambda over the
    slice); the model joins are equi-joins on the bigram/context keys
    (shuffle — the bigram table of a 100 TB corpus is far beyond
    broadcast) plus one broadcast of the bounded unigram head.  No
    windows, no UDFs."""
    counts, total = _token_stats(df, text_col)
    vocab = _vocab_head(counts, vocab_size)
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    bg = (
        base.filter(F.size("_t") >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.slice(F.col("_t"), 1, F.size("_t") - 1),
                    lambda x, i: F.struct(
                        x.alias("prev"), F.get(F.col("_t"), i + 1).alias("tok")
                    ),
                )
            ).alias("_bg"),
        )
        .select(id_col, F.col("_bg.prev").alias("prev"), F.col("_bg.tok").alias("tok"))
    )
    bc = bg.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("_cbi"))
    ctx = bc.groupBy("prev").agg(F.sum("_cbi").alias("_cctx"))
    pruned = bc.filter(F.col("_cbi") >= min_bigram_count)
    scored = (
        bg.join(pruned, ["prev", "tok"], "left")
        .join(ctx, "prev")
        .join(F.broadcast(vocab.withColumnRenamed("token", "tok")), "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.when(
                F.col("_cbi").isNotNull(),
                F.log(F.col("_cbi") / F.col("_cctx")),
            )
            .otherwise(
                F.log(
                    F.lit(alpha)
                    * F.coalesce(F.col("cnt"), F.lit(1)).cast("double")
                    / F.col("_total")
                )
            )
            .alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_lp"), 4).alias("logprob"),
    )


def perplexity_buckets(
    df: DataFrame,
    vocab_size: int = 1000,
    min_bigram_count: int = 2,
    band: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the :func:`bigram_backoff_logprob` LM, then
    split the corpus into head / middle / tail quality bands around the
    corpus mean NLL — head = NLL ≤ μ − band·σ (most fluent), tail =
    NLL > μ + band·σ, middle between.  Returns one row per bucket:
    (bucket, n_docs, avg_nll) — the mixture-weight input for a
    quality-curriculum sampler (CCNet trains mostly on head+middle).

    Determinism: μ and σ round to 6 dp before the thresholds are
    formed, and the per-doc NLL is already rounded to 4 dp, so the
    band comparisons see bit-identical doubles on both engines (IEEE
    subtract/multiply of identical operands).  Thresholding against
    broadcast scalars replaces the global NTILE a naive tercile split
    would need — no single-partition window, so the bucketing holds at
    any corpus size (the doc-score table never globally sorts)."""
    lp = bigram_backoff_logprob(
        df, vocab_size, min_bigram_count, text_col=text_col, id_col=id_col
    )
    stats = lp.agg(
        F.round(F.avg("logprob"), 6).alias("_mu"),
        F.round(F.stddev_pop("logprob"), 6).alias("_sd"),
    )
    banded = lp.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.when(
            F.col("logprob") <= F.col("_mu") - F.lit(band) * F.col("_sd"), F.lit("head")
        )
        .when(F.col("logprob") > F.col("_mu") + F.lit(band) * F.col("_sd"), F.lit("tail"))
        .otherwise(F.lit("middle")),
    )
    return banded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("logprob"), 4) + F.lit(0.0)).alias("avg_nll"),
    )
