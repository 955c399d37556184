"""Property-based tests (hypothesis): decode tie/overlap invariants,
tokenizer engine parity, minhash accuracy — the randomized layer of the
test plan (SURVEY §5 item 1)."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gliner_spark.kernel.decode import (
    decode_batch,
    decode_row,
    greedy_search_reference,
)
from gliner_spark.kernel.tokenizer import TOKEN_PATTERN, tokenize_with_offsets

spans_strategy = st.lists(
    st.tuples(
        st.integers(0, 15),              # start
        st.integers(0, 8),               # width-1
        st.integers(0, 3),               # class
        st.sampled_from([0.51, 0.6, 0.6, 0.75, 0.9]),  # score w/ dup ties
    ),
    max_size=25,
)


@given(spans_strategy, st.booleans(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_greedy_matches_reference_on_random_spans(items, flat_ner, multi_label):
    """decode_batch's greedy (pure-Python path) == the literal reference
    restatement for arbitrary candidate sets, including score ties."""
    # build a probs tensor that yields exactly these candidates, in
    # (start, width, class) row-major enumeration order
    L, K, C = 24, 9, 4
    probs = np.zeros((1, L, K, C), dtype=np.float32)
    for s, w, c, sc in items:
        probs[0, s, w, c] = sc
    got = decode_batch(probs, np.array([L]), 0.5, flat_ner, multi_label)[0]

    cands = []
    for s in range(L):
        for w in range(K):
            for c in range(C):
                v = probs[0, s, w, c]
                if v > 0.5:
                    cands.append((s, s + w, c, float(v)))
    exp = greedy_search_reference(cands, flat_ner, multi_label)
    assert [(s, e, c) for s, e, c, _ in got] == [
        (s, e, c) for s, e, c, _ in exp
    ]


@given(spans_strategy)
@settings(max_examples=100, deadline=None)
def test_decode_batch_equals_per_row_decode(items):
    L, K, C = 24, 9, 4
    probs = np.zeros((2, L, K, C), dtype=np.float32)
    for s, w, c, sc in items:
        probs[0, s, w, c] = sc
        probs[1, (s + 3) % L, w, c] = sc
    batched = decode_batch(probs, np.array([L, L - 4]), 0.5)
    for b in range(2):
        s_, e_, c_, sc_ = decode_row(probs[b], L if b == 0 else L - 4, 0.5)
        assert [(s, e, c) for s, e, c, _ in batched[b]] == list(
            zip(s_.tolist(), e_.tolist(), c_.tolist())
        )


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
               max_size=120))
@settings(max_examples=300, deadline=None)
def test_tokenizer_offsets_are_consistent(text):
    toks, starts, ends = tokenize_with_offsets(text)
    assert len(toks) == len(starts) == len(ends)
    for t, s, e in zip(toks, starts, ends):
        assert text[s:e] == t
        assert 0 <= s < e <= len(text)
    # concatenation order is strictly increasing
    assert all(a < b for a, b in zip(starts, starts[1:]))


@given(st.text(alphabet=st.characters(codec="ascii", min_codepoint=32),
               max_size=80))
@settings(max_examples=200, deadline=None)
def test_python_and_java_regex_agree_on_ascii(text):
    """The native Spark/DuckDB path uses the same pattern under Java/RE2
    semantics; for ASCII inputs `\\w` is identical, so the plain re module
    run with re.ASCII must equal the default (documents corpus is ASCII —
    this is the invariant behind every oracle-checked textstats query)."""
    default = re.findall(TOKEN_PATTERN, text)
    ascii_mode = re.findall(TOKEN_PATTERN, text, flags=re.ASCII)
    assert default == ascii_mode


def test_minhash_estimates_jaccard():
    """Banded minhash signature agreement rate ≈ true Jaccard (seeded,
    deterministic check on constructed sets)."""
    import zlib

    P = (1 << 31) - 1
    import random

    rng = random.Random(9)
    coeffs = [(rng.randrange(1, P), rng.randrange(0, P)) for _ in range(256)]

    def sig(items):
        hs = [zlib.crc32(i.encode()) % P for i in items]
        return [min((a * h + b) % P for h in hs) for a, b in coeffs]

    base = [f"sh{i}" for i in range(100)]
    variant = base[:80] + [f"x{i}" for i in range(20)]  # J = 80/120 ≈ 0.667
    sa, sb = sig(base), sig(variant)
    agree = sum(x == y for x, y in zip(sa, sb)) / len(sa)
    true_j = 80 / 120
    assert abs(agree - true_j) < 0.08
