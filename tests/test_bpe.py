"""Corpus-trained BPE tokenizer (operators/bpe.py): hand-computed
merges on a toy dict, training/encoding consistency, python↔Spark
encode parity, JVM↔python pretokenizer agreement, determinism, and the
head-dict cap.
"""

import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.bpe import (
    BPEModel,
    _apply_merges,
    _train_merges,
    bpe_encode,
    train_bpe,
)
from gliner_spark.operators.textstats import BPE_ISH_PATTERN

CORPUS = [
    (0, "the theme of the thesis is these themes"),
    (1, "then the theory was there and the thesis held"),
    (2, "a theme, a thesis; the theory again"),
    (3, "low lower lowest low low newer newest new"),
    (4, "widget the widget therefore the theme"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


# ---------------------------------------------------------- trainer math


def test_hand_computed_merges():
    # dict: "aaab" x3, "aab" x2 → pairs: (a,a): 3*2 + 2*1 = 8,
    # (a,b): 3+2 = 5. First merge (a,a) → words [aa,a,b]x3, [aa,b]x2.
    # Then pairs: (aa,a):3, (aa,b):2, (a,b):3 → tie 3 between (a,b) and
    # (aa,a): lexicographic min is ('a','b') ('a' < 'aa').
    merges = _train_merges([("aaab", 3), ("aab", 2)], n_merges=2,
                           min_pair_count=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_overlapping_pair_left_to_right():
    # "aaaa": (a,a) counts 3 occurrences but merges non-overlapping
    # left-to-right → [aa, aa]; next round (aa,aa) merges → [aaaa].
    merges = _train_merges([("aaaa", 5)], n_merges=2, min_pair_count=2)
    assert merges == [("a", "a"), ("aa", "aa")]
    assert _apply_merges("aaaa", merges, {}) == ["aaaa"]
    assert _apply_merges("aaa", merges, {}) == ["aa", "a"]


def test_min_pair_count_stops():
    # every pair unique → nothing reaches min_pair_count=2
    assert _train_merges([("abc", 1), ("xyz", 1)], 8, 2) == []


def test_training_dict_words_reproduce_training_segmentation():
    wf = [("lower", 4), ("lowest", 3), ("newer", 3), ("low", 2)]
    merges = _train_merges(wf, n_merges=6, min_pair_count=2)
    # replay the trainer by hand: final symbol state of each word must
    # equal what encode produces
    for w, _ in wf:
        syms = [c for c in w]
        for a, b in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        assert _apply_merges(w, merges, {}) == syms
        assert "".join(syms) == w  # merges never drop characters


# ------------------------------------------------------- Spark operators


def test_train_bpe_deterministic_and_compresses(spark, docs):
    m1 = train_bpe(docs, n_merges=16, max_words=1000)
    m2 = train_bpe(docs, n_merges=16, max_words=1000)
    assert m1.merges == m2.merges
    assert len(m1.merges) > 0
    # 'the' is the dominant pretoken → 't h e' should fold to one token
    cache = {}
    assert len(_apply_merges("the", m1.merges, cache)) < 3
    # vocab = base chars + merges
    assert set(m1.vocab()) >= {a + b for a, b in m1.merges}


def test_jvm_python_pretokenizer_agreement(spark, docs):
    jvm = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    )
    jvm_counts = {r["w"]: r["f"] for r in jvm}
    py_counts = Counter()
    for _, text in CORPUS:
        py_counts.update(re.findall(BPE_ISH_PATTERN, text))
    assert jvm_counts == dict(py_counts)


def test_spark_encode_matches_python_oracle(spark, docs):
    model = train_bpe(docs, n_merges=12, max_words=1000)
    got = {
        r["doc_id"]: r
        for r in bpe_encode(docs, model, with_tokens=True).collect()
    }
    assert set(got) == {d for d, _ in CORPUS}
    for doc_id, text in CORPUS:
        pres = re.findall(BPE_ISH_PATTERN, text)
        toks = []
        cache = {}
        for w in pres:
            toks.extend(_apply_merges(w, model.merges, cache))
        row = got[doc_id]
        assert row["n_pretokens"] == len(pres)
        assert row["n_tokens"] == len(toks)
        assert list(row["tokens"]) == toks
        # merges are pretoken-scoped → concatenation preserves the text
        assert "".join(toks) == "".join(pres)


def test_more_merges_never_more_tokens(spark, docs):
    small = train_bpe(docs, n_merges=4, max_words=1000)
    big = train_bpe(docs, n_merges=32, max_words=1000)
    assert small.merges == big.merges[: len(small.merges)]
    n_small = (
        bpe_encode(docs, small).agg(F.sum("n_tokens")).collect()[0][0]
    )
    n_big = bpe_encode(docs, big).agg(F.sum("n_tokens")).collect()[0][0]
    assert n_big <= n_small


def test_head_dict_cap(spark, docs):
    # max_words=1 keeps only the most frequent pretoken (ties by word) —
    # training still runs and merges only within that word
    model = train_bpe(docs, n_merges=8, max_words=1)
    assert all(
        set(a + b) <= set("".join(model.base_chars)) for a, b in model.merges
    )


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ok ok ok")], "doc_id long, text string"
    )
    model = BPEModel([("o", "k")], ["o", "k"])
    rows = {r["doc_id"]: r for r in bpe_encode(df, model).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[0]["n_pretokens"] == 0
    assert rows[1]["n_tokens"] == 0
    # pretokens "ok", " ok", " ok" → ["ok"], [" ", "ok"], [" ", "ok"]
    assert rows[2]["n_pretokens"] == 3
    assert rows[2]["n_tokens"] == 5


# ------------------------------------------------- property-based (pure python)

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcdef ", min_size=1, max_size=12).map(
    lambda s: s.replace(" ", "") or "a"
)
_dicts = st.lists(
    st.tuples(_words, st.integers(min_value=1, max_value=9)),
    min_size=1,
    max_size=12,
).map(lambda ws: list({w: f for w, f in ws}.items()))


@settings(max_examples=60, deadline=None)
@given(_dicts, st.integers(min_value=0, max_value=12))
def test_prop_merges_preserve_text_and_shrink(wf, n_merges):
    merges = _train_merges(wf, n_merges, min_pair_count=2)
    cache = {}
    for w, _ in wf:
        toks = _apply_merges(w, merges, cache)
        assert "".join(toks) == w          # lossless
        assert 1 <= len(toks) <= len(w)    # never grows
        assert all(t for t in toks)        # no empty symbols


@settings(max_examples=40, deadline=None)
@given(_dicts)
def test_prop_merge_prefix_and_determinism(wf):
    m_small = _train_merges(wf, 3, min_pair_count=2)
    m_big = _train_merges(wf, 10, min_pair_count=2)
    assert m_big[: len(m_small)] == m_small
    assert _train_merges(wf, 10, min_pair_count=2) == m_big


@settings(max_examples=40, deadline=None)
@given(_dicts)
def test_prop_encode_idempotent_on_tokens(wf):
    """Encoding a word, then encoding each produced token, changes
    nothing — the token set is closed under the merge list."""
    merges = _train_merges(wf, 8, min_pair_count=2)
    cache = {}
    for w, _ in wf:
        toks = _apply_merges(w, merges, cache)
        for t in toks:
            assert _apply_merges(t, merges, {}) == [t]
