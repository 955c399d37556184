"""Native (JVM-side) text expression helpers shared across operators.

Everything here is a Catalyst expression builder — no UDFs. The token
pattern is the reference's WhitespaceTokenSplitter regex
(gliner/data_processing/tokenizer.py:17). Note Java/RE2 `\\w` is
ASCII-only while Python's is Unicode-aware; the NER path (which must match
the reference byte-for-byte, including Unicode) therefore tokenizes inside
its Arrow stage with Python `re`, while these native helpers back the
corpus-analytics operators (dedup, stats, quality) where DuckDB-oracle
parity matters and inputs are ASCII-tokenizable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel.tokenizer import TOKEN_PATTERN

STOPWORDS = (
    "the a an of to and in is on for with as by at from or be are was were "
    "it this that we you they he she i not no yes do does did have has had"
).split()


def tokens(col: Column) -> Column:
    """Array of reference-regex tokens (ASCII-equivalent to kernel)."""
    return F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_ngrams(tok_col: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token-array column.

    Two constructions, same values (parity A/B'd at 300k docs):

    - small n (<= 4): a zip_with CHAIN — acc zipped with the j-shifted
      token array, concatenating one token per step. 4-6x faster than
      the index-sequence form (no index array, no per-gram slice; the
      chained concat copies O(n^2) chars per gram, negligible at small
      n). This is the hot shape: shingles/bigrams/trigrams for minhash,
      jaccard, classifiers.
    - large n (e.g. decontamination 13-grams): the O(n^2) chain loses
      its edge (A/B: 0.6-1.0x), so keep one concat_ws over a slice per
      gram, indexed by a sequence.

    Explicitly EMPTY when the doc has fewer than n tokens: a bare
    `sequence(1, greatest(size-n+1, 0))` silently produces the
    DESCENDING sequence [1, 0] there (Spark sequence auto-negates its
    step), i.e. a bogus short gram plus a slice-at-0 hazard; the
    zip_with chain instead pads with nulls that the final slice drops."""
    sz = F.size(tok_col)
    if n == 1:
        return tok_col
    if n <= 4:
        acc = tok_col
        for j in range(1, n):
            shifted = F.slice(tok_col, j + 1, F.greatest(sz - j, F.lit(0)))
            acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
        return F.when(sz >= n, F.slice(acc, 1, sz - n + 1)).otherwise(
            F.array().cast("array<string>")
        )
    idx = F.when(
        sz >= n, F.sequence(F.lit(1), sz - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tok_col, i, n))
    )


def hashed_word_ngrams(tok_col: Column, n: int) -> Column:
    """int64 n-gram keys built as a zip_with CHAIN instead of a
    transform-over-index-sequence: acc starts as the token array and
    each step j zips it with the tokens shifted by j, hashing
    (acc, next_token) — so gram i ends as the left-fold hash of tokens
    i..i+n-1. A/B-measured ~6× faster than the per-gram
    transform(sequence, i -> …slice(toks, i, n)…) shape at 300k docs
    (1.5 s vs 10–13 s for trigram construction+distinct): the index
    sequence materialization and per-gram slice were the cost, not the
    hashing or the compares.

    The chained hash is injective over the token tuple up to 64-bit
    collisions (~1e-16 per doc), and downstream distinct/sort/run-fold
    compare 8-byte ints instead of strings. zip_with pads the shorter
    (shifted) side with nulls — those garbage tail entries are sliced
    off, and the empty-below-n guard keeps the same shape as
    word_ngrams."""
    sz = F.size(tok_col)
    if n == 1:
        return F.transform(tok_col, lambda t: F.xxhash64(t))
    acc = tok_col
    for j in range(1, n):
        shifted = F.slice(tok_col, j + 1, F.greatest(sz - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda h, c: F.xxhash64(h, c))
    return F.when(sz >= n, F.slice(acc, 1, sz - n + 1)).otherwise(
        F.array().cast("array<bigint>")
    )


def normalized_text(col: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(tok_col: Column) -> Column:
    # int64-hashed probe (xxhash64 of a literal folds to a constant
    # array): 2.6× over string array_contains in interpreted HOFs,
    # measured on the blocklist twin at 1M docs — values identical
    sw = F.array(*[F.xxhash64(F.lit(w)) for w in STOPWORDS])
    hits = F.size(
        F.filter(
            tok_col, lambda t: F.array_contains(sw, F.xxhash64(F.lower(t)))
        )
    )
    return F.when(F.size(tok_col) > 0, hits / F.size(tok_col)).otherwise(
        F.lit(0.0)
    )
