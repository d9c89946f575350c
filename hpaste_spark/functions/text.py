"""Text-analysis column functions — all JVM-side expression compositions
(no Python UDFs in the hot path; SURVEY §2.8).

The reference has no scalar-function library (values are opaque bytes;
transformation is arbitrary Scala in mappers, e.g. URL parsing at
WebCrawlSchemaTest.scala:39).  These functions are the engine's
Spark-native equivalent surface plus the LLM-pipeline text operators
(tokenize, quality scoring, language-ID heuristic, fingerprinting).

Every function here has a line-for-line DuckDB-SQL translation used by
the correctness oracle, so the exact formulas (hash base/modulus,
stopword lists, marker words) are part of the contract — change them in
both places.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic polynomial-hash parameters (shared with the DuckDB oracle).
HASH_MOD = 1_000_000_007
HASH_BASE = 31

STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

# language-ID marker words: first match (in order) wins
LANG_MARKERS = (
    ("es", ("el", "la", "de", "que")),
    ("de", ("der", "die", "das", "und")),
    ("fr", ("le", "les", "des", "est")),
    ("en", ("the", "and", "is", "of")),
)


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


# GPT-2-style pre-tokenizer approximation: contraction suffixes, then
# space-prefixed letter runs, digit runs, and punctuation runs, then
# bare whitespace.  Leftmost-first alternation semantics are identical
# in Java regex (Spark) and RE2 (DuckDB) for this ASCII-class pattern,
# so counts match the oracle exactly.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Subword-granularity token-count estimate (BPE-ish regex): the
    number of pre-tokenizer pieces, a cheap stand-in for an actual BPE
    vocabulary pass when budgeting LLM training tokens."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[.,!?;:]", ""))


def stopword_count(col: Column) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*STOPWORDS)))


def stopword_ratio(col: Column) -> Column:
    # bind1: the token split would otherwise run twice (count + filter)
    return bind1(
        tokens(col),
        lambda t: F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / F.size(t)
        ),
    )


def avg_token_len(col: Column) -> Column:
    def _avg(t: Column) -> Column:
        n = F.size(t)
        total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        return F.when(n == 0, F.lit(0.0)).otherwise(total / n)

    return bind1(tokens(col), _avg)


def quality_score(col: Column) -> Column:
    """Composite quality heuristic: penalize very short docs, high
    punctuation density and stopword-free (non-natural) text.  The
    token split is bound ONCE (r13 bind1): the length, stopword and
    ratio terms otherwise each re-ran the regex split per row."""

    def _score(t: Column) -> Column:
        n = F.size(t)
        len_score = F.least(n / F.lit(100.0), F.lit(1.0))
        stop_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / n
        )
        punct_ratio = F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
            punct_count(col) / F.length(col)
        )
        return F.round(
            F.lit(0.5) * len_score
            + F.lit(0.3) * stop_ratio
            + F.lit(0.2) * (1 - punct_ratio),
            4,
        )

    return bind1(tokens(col), _score)


def lang_guess(col: Column) -> Column:
    """N-gram-free language-ID heuristic: first language whose marker
    words appear among the tokens wins; 'unknown' otherwise.  Token
    split bound once across the per-language membership tests."""

    def _member_of(words):
        return lambda x: x.isin(*words)

    def _guess(t: Column) -> Column:
        out = F.lit("unknown")
        for lang, markers in reversed(LANG_MARKERS):
            hit = F.size(F.filter(t, _member_of(markers))) > 0
            out = F.when(hit, F.lit(lang)).otherwise(out)
        return out

    return bind1(tokens(col), _guess)


def poly_hash(col: Column, mod: int = HASH_MOD, base: int = HASH_BASE) -> Column:
    """Deterministic polynomial rolling hash over UTF-8 codepoints —
    the document-fingerprinting primitive.  acc = (acc*base + cp) % mod.
    Expressed with F.aggregate so it runs inside codegen, not Python."""
    chars = F.filter(F.split(col, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def token_hash(col: Column) -> Column:
    """52-bit md5-prefix token hash: one JVM md5 intrinsic per token
    instead of a per-character interpreted fold — measured ~5× faster
    over the documents fixture (char-level HOF lambdas dominate the
    minhash pipeline otherwise).  DuckDB twin:
    ``CAST(('0x' || substr(md5(t), 1, 13)) AS BIGINT)``.
    13 hex chars = 52 bits keeps every hash < 2^53, so SimHash's
    bit-extraction-by-double-division stays exact."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 13), 16, 10).cast("long")


def bind1(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and hand it to ``fn`` as a bound
    lambda variable: ``transform(array(col), fn)[1]``.

    Spark has no `let` expression, and a non-cheap subtree that appears
    k times inside ONE Column expression is re-evaluated k times per
    row — there is no cross-occurrence subexpression elimination
    inside Generate/HOF expression trees (the winnow_select docstring
    documents the caller-side select workaround; this helper closes
    the hazard INSIDE composed expressions, where no projection
    boundary is available).  A lambda-variable reference, by contrast,
    is a bound-value read.  Measured on the 5-gram pipeline at sf0.1:
    the explode leg drops 2.6 s → 0.6 s (the token-hash array was
    being recomputed once per zip_with slice).  The one-element
    transform adds a single interpreted lambda call per row — noise
    next to the chains it wraps, which are HOFs (CodegenFallback)
    already."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-word shingles (the MinHash input): array of space-joined n-grams.

    zip_with chain over n aligned slices, NOT transform-over-indices:
    a lambda body referencing the token array re-evaluates the regexp
    split once PER ELEMENT (O(tokens²) splits per doc — measured 6.5s
    → 1.5s for the sf0.1 shingle explode); as zip_with arguments the
    slices evaluate once per row.  The token array itself is bound
    ONCE via :func:`bind1` (r13): as a plain subtree it appeared in
    every slice argument and was re-tokenized n+1 times per row.  The
    greatest(…, 0) slice length doubles as the short-doc guard: < n
    tokens → empty slices → empty shingle array."""

    def _chain(t: Column) -> Column:
        m = F.greatest(F.size(t) - (n - 1), F.lit(0))
        acc = F.slice(t, 1, m)
        for j in range(1, n):
            acc = F.zip_with(
                acc, F.slice(t, 1 + j, m), lambda a, w: F.concat(a, F.lit(" "), w)
            )
        return acc

    return bind1(tokens(col), _chain)


def shingle_hashes(col: Column, n: int = 3, mod: int = HASH_MOD, base: int = HASH_BASE) -> Column:
    """Hashes of the word shingles — input to MinHash signatures.

    Two-level hash: each token is md5-hashed ONCE per document
    (token_hash), then a shingle hash folds its n token hashes —
    O(tokens + shingles·n) JVM hash calls, no per-character work.
    The exact formula is mirrored in the DuckDB oracle (see
    __spark_entry__.dedup_minhash_lsh).

    Structured as a zip_with chain over n aligned slices rather than a
    transform-over-indices: Spark re-evaluates any subexpression that
    appears inside a lambda body once PER ELEMENT, so referencing the
    token-hash array inside a per-shingle lambda recomputes the whole
    char-level hash per shingle (~50× the work; measured 19.6s → 5.9s
    at sf0.1).  As zip_with *arguments* the slices are evaluated once
    per row — and the token-hash array they slice is bound ONCE via
    :func:`bind1` (r13): as a plain subtree it was re-evaluated (one
    md5 pass over every token) once per slice argument, ~n× per row;
    measured 2.6 s → 0.6 s on the sf0.1 5-gram explode leg."""

    def _chain(th: Column) -> Column:
        m = F.greatest(F.size(th) - (n - 1), F.lit(0))
        acc = F.slice(th, 1, m)
        for j in range(1, n):
            acc = F.zip_with(
                acc, F.slice(th, 1 + j, m), lambda a, t: (a * base + t) % mod
            )
        return acc

    return bind1(F.transform(tokens(col), token_hash), _chain)


def minhash_signature(col: Column, num_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature: for hash fn i, min over shingles of
    (a_i*h + b_i) mod p with fixed a_i = 2i+1, b_i = 7919*i.
    Deterministic and oracle-reproducible.

    One fold over the shingle hashes with a num_hashes-wide accumulator
    (per-hash-column array_min over transform would inline and
    re-evaluate the shingle pipeline num_hashes times).  Sentinel
    HASH_MOD (unreachable: every permuted hash is < mod) marks "no
    shingles" and is mapped to null to match array_min-on-empty."""
    hashes = shingle_hashes(col, n)
    iseq = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(HASH_MOD).cast("long"), num_hashes)
    folded = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, iseq, lambda a, i: F.least(a, ((2 * i + 1) * h + 7919 * i) % HASH_MOD)
        ),
    )
    return F.transform(folded, lambda v: F.when(v < HASH_MOD, v))


def winnow_select(h: Column, w: int = 4) -> Column:
    """Window-min selection over an EXISTING k-gram hash array: the
    minimum in each sliding window of ``w`` consecutive hashes,
    deduplicated.  ``h`` appears ~2w times in the zip_with/least chain
    ARGUMENTS — pass an attribute (a column materialized by a prior
    select), not the raw shingle_hashes expression, or the whole
    hashing pipeline is evaluated ~2w times per row (measured 6x on
    the sf0.1 winnow bench; CollapseProject keeps a multiply-referenced
    non-cheap projection un-inlined, so the two-step select is safe)."""
    m = F.greatest(F.size(h) - (w - 1), F.lit(0))
    acc = F.slice(h, 1, m)
    for j in range(1, w):
        acc = F.zip_with(acc, F.slice(h, 1 + j, m), lambda a, b: F.least(a, b))
    return F.array_distinct(acc)


def winnow_fingerprints(col: Column, n: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS local fingerprinting scheme): the minimum
    k-gram hash in each sliding window of ``w`` consecutive k-gram
    hashes, deduplicated.  Guarantees a match of length >= n+w-1
    shares a fingerprint while storing only ~2/(w+1) of the hashes.

    Convenience composition for single-expression use; the hash array
    is bound once via :func:`bind1` (r13), so this no longer pays the
    ~2w× re-evaluation winnow_select's docstring warns about —
    operators may still prefer the explicit two-step select for plan
    readability."""
    return bind1(shingle_hashes(col, n), lambda h: winnow_select(h, w))


def normalize_text(col: Column) -> Column:
    """Canonical form for exact-dedup keys: lowercase, strip markup-ish
    tags, collapse runs of whitespace, trim.  Mirrored in the oracle
    with DuckDB regexp_replace(…, 'g')."""
    stripped = F.regexp_replace(col, r"<[^>]*>", " ")
    collapsed = F.regexp_replace(F.lower(stripped), r"\s+", " ")
    return F.trim(collapsed)


def strip_tags(col: Column) -> Column:
    """Remove HTML/XML-ish tags (training-corpus cleaning primitive)."""
    return F.regexp_replace(col, r"<[^>]*>", " ")


def extract_urls(col: Column) -> Column:
    """All http(s) URLs in the text as an array."""
    return F.regexp_extract_all(col, F.lit(r"(https?://[^\s]+)"), 1)


def dup_ngram_ratio(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram —
    the within-document repetition signal of Gopher-style quality
    filtering (Rae et al. 2021, §A1.1).  Null when the document has
    fewer than n tokens.  Pure array expressions: zero shuffle, fully
    whole-stage-codegen."""
    return bind1(
        word_shingles(col, n),
        lambda bg: F.when(
            F.size(bg) > 0, F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg)
        ),
    )


def top_token_ratio(col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token
    (the other Gopher repetition gate).  Shuffle-free: sort the token
    array, then one fold tracking the longest run of equal adjacent
    elements — per-document max frequency without exploding tokens
    into a (doc, token) aggregation."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        newrun = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), newrun.alias("run"), F.greatest(acc["best"], newrun).alias("best")
        )

    def _ratio(toks: Column) -> Column:
        best = F.aggregate(F.array_sort(toks), init, step, lambda acc: acc["best"])
        return F.when(F.size(toks) > 0, best / F.size(toks))

    return bind1(tokens(col), _ratio)


# PII scrub patterns (ASCII-only so Java regex and RE2 agree); applied
# longest-form first so an email is redacted before its domain-ish tail
# could half-match another pattern.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]"),
)


def redact_pii(col: Column, kinds: tuple = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII occurrence with ``[<KIND>]`` — the standard
    pretraining-corpus scrub.  Pure regexp_replace chain: JVM-side,
    order fixed by PII_PATTERNS."""
    out = col
    for kind, pat in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-kind PII match counts — counts of what redact_pii
    actually replaces: pattern i is counted on the text with patterns
    < i already redacted, exactly the scrub's sequential chain.  (An
    independent per-pattern count overcounts: a digit-heavy email local
    part also matches the phone pattern, but the scrub replaces it once
    as an email — audit counts must reconcile with the replacement.)"""
    counts = []
    scrubbed = col
    for kind, pat in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(kind))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{kind.upper()}]")
    return F.struct(*counts)
