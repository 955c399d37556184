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


# --- winnowing fingerprint guarantee (r4 continuation) ---------------

def _winnow_py(toks, k, w):
    import hashlib

    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    out = set()
    for i in range(len(hs) - w + 1):
        sub = hs[i:i + w]
        mn = min(sub)
        out.add((i + max(j for j, v in enumerate(sub) if v == mn), mn))
    return out


_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@given(
    st.lists(_tok, min_size=0, max_size=12),   # prefix of doc A
    st.lists(_tok, min_size=8, max_size=20),   # the shared run
    st.lists(_tok, min_size=0, max_size=12),   # suffix of doc B
    st.integers(2, 4),                         # k
    st.integers(2, 4),                         # window
)
@settings(max_examples=150, deadline=None)
def test_winnow_shared_run_guarantee_property(pre, shared, suf, k, w):
    """Schleimer et al. theorem: two docs sharing a token run of
    >= w+k-1 tokens share at least one fingerprint HASH (positions
    differ by the offset). Checked on the python restatement that
    test_winnow.py pins bit-for-bit against the Spark operator."""
    if len(shared) < w + k - 1:
        return
    a = pre + shared
    b = shared + suf
    fa = {h for _, h in _winnow_py(a, k, w)}
    fb = {h for _, h in _winnow_py(b, k, w)}
    assert fa & fb


@given(st.lists(_tok, min_size=10, max_size=60), st.integers(2, 5))
@settings(max_examples=100, deadline=None)
def test_winnow_selection_is_suffix_stable_property(toks, w):
    """Winnowing picks only window minima: every selected fingerprint
    hash must be a gram hash, and selections are within bounds."""
    k = 3
    if len(toks) < k + w - 1:
        return
    import hashlib

    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    sel = _winnow_py(toks, k, w)
    assert sel  # at least one window exists
    for pos, h in sel:
        assert 0 <= pos < len(hs)
        assert hs[pos] == h
        # density guarantee: gaps between consecutive selected
        # positions never exceed w (each window contributes)
    ps = sorted(p for p, _ in sel)
    assert all(b - a <= w for a, b in zip(ps, ps[1:]))


# ---------------------------------------------- batch-2 temporal ops


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

_iv = _st.tuples(
    _st.integers(0, 3),                       # key
    _st.integers(0, 300),                     # start
    _st.integers(-5, 120),                    # length (neg = invalid)
)
_pt = _st.tuples(_st.integers(0, 3), _st.integers(0, 330))


@_settings(max_examples=12, deadline=None)
@_given(
    pts=_st.lists(_pt, min_size=0, max_size=25),
    ivs=_st.lists(_iv, min_size=0, max_size=15),
    bucket=_st.sampled_from([1, 7, 64, None]),
)
def test_interval_join_property_vs_bruteforce(spark, pts, ivs, bucket):
    from gliner_spark.operators.temporal import interval_join

    prows = [(j, k, ts) for j, (k, ts) in enumerate(pts)]
    irows = [(j, k, s, s + ln) for j, (k, s, ln) in enumerate(ivs)]
    p = spark.createDataFrame(prows, "pid long, k long, ts long") \
        if prows else spark.createDataFrame([], "pid long, k long, ts long")
    i = spark.createDataFrame(irows, "iid long, k long, s long, e long") \
        if irows else spark.createDataFrame(
            [], "iid long, k long, s long, e long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            p, i, "ts", "s", "e", key_cols=("k",),
            value_cols=("iid",), bucket_us=bucket,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, pk, ts in prows
        for iid, ik, s, e in irows
        if pk == ik and s <= e and s <= ts <= e
    )
    assert got == want


@_settings(max_examples=12, deadline=None)
@_given(ivs=_st.lists(_iv, min_size=0, max_size=30))
def test_coalesce_property_invariants(spark, ivs):
    from gliner_spark.operators.temporal import coalesce_intervals

    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "key long, start long, end long") \
        if rows else spark.createDataFrame(
            [], "key long, start long, end long")
    out = coalesce_intervals(df, ("key",), "start", "end").collect()
    valid = [(k, s, e) for k, s, e in rows if e >= s]
    # (1) merged spans are disjoint and non-touching per key
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(
            (r["start_us"], r["end_us"])
        )
    for k, spans in by_key.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1
    # (2) every valid input interval is covered by exactly one span
    for k, s, e in valid:
        spans = by_key[k]
        assert sum(1 for a, b in spans if a <= s and e <= b) == 1
    # (3) n_merged sums to the valid input count
    assert sum(r["n_merged"] for r in out) == len(valid)
