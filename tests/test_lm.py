"""Bigram-LM perplexity operator (operators/lm.py) vs a pure-python
replay: exact count parity, smoothing math, OOV/pruning behavior, and
the broadcast plan shape."""

import math
from collections import Counter

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.lm import (
    BOS,
    score_perplexity,
    train_bigram_lm,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "a dog sat on a log"),
    (3, "the dog ate a bone"),
    (4, "cat and dog sat together quietly"),
]


def _py_bigrams(text):
    toks = [t.lower() for t in text.split()]
    prevs = [BOS] + toks[:-1]
    return list(zip(prevs, toks))


def _py_model(rows, k=0.5):
    bc, cc, vocab = Counter(), Counter(), set()
    for _, text in rows:
        for p, c in _py_bigrams(text):
            bc[(p, c)] += 1
            cc[p] += 1
            vocab.add(c)
    return bc, cc, len(vocab)


def _py_score(text, bc, cc, v, k=0.5):
    lps = [
        math.log((bc.get((p, c), 0) + k) / (cc.get(p, 0) + k * v))
        for p, c in _py_bigrams(text)
    ]
    return sum(lps) / len(lps)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_train_counts_match_python(spark, docs):
    model = train_bigram_lm(docs, k=0.5)
    bc, cc, v = _py_model(CORPUS)
    got_b = {(r.prev, r.cur): r.b for r in model.bigrams.collect()}
    got_c = {r.prev: r.c for r in model.contexts.collect()}
    assert got_b == dict(bc)
    assert got_c == dict(cc)
    assert model.vocab_size == v


def test_score_matches_python_replay(spark, docs):
    model = train_bigram_lm(docs, k=0.5)
    out = {r.doc_id: r for r in score_perplexity(docs, model).collect()}
    bc, cc, v = _py_model(CORPUS)
    for did, text in CORPUS:
        r = out[did]
        n = len(_py_bigrams(text))
        assert r.n_bigrams == n
        assert r.n_hits == n  # train corpus == score corpus
        expect = _py_score(text, bc, cc, v)
        assert abs(r.avg_logprob - expect) < 1e-12
        assert abs(r.perplexity - math.exp(-expect)) < 1e-9


def test_oov_scores_finitely_and_below_seen(spark, docs):
    model = train_bigram_lm(docs, k=0.5)
    unseen = spark.createDataFrame(
        [(100, "zebra quark flux"), (101, "the cat sat on the mat")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in score_perplexity(unseen, model).collect()}
    assert out[100].n_hits == 0
    assert math.isfinite(out[100].avg_logprob)
    # the memorized sentence must be far more probable than gibberish
    assert out[101].avg_logprob > out[100].avg_logprob
    assert out[101].perplexity < out[100].perplexity
    bc, cc, v = _py_model(CORPUS)
    assert abs(out[100].avg_logprob - _py_score("zebra quark flux", bc, cc, v)) < 1e-12


def test_pruning_keeps_contexts_exact(spark, docs):
    pruned = train_bigram_lm(docs, k=0.5, prune_min_count=2)
    full = train_bigram_lm(docs, k=0.5)
    kept = {(r.prev, r.cur) for r in pruned.bigrams.collect()}
    allb = {(r.prev, r.cur): r.b for r in full.bigrams.collect()}
    assert kept == {kk for kk, b in allb.items() if b >= 2}
    # contexts and vocab are NOT pruned — denominators stay exact
    assert sorted(map(tuple, pruned.contexts.collect())) == sorted(
        map(tuple, full.contexts.collect())
    )
    assert pruned.vocab_size == full.vocab_size
    # pruned bigrams degrade to the smoothed floor: score drops, stays finite
    out_full = {r.doc_id: r for r in score_perplexity(docs, full).collect()}
    out_pruned = {r.doc_id: r for r in score_perplexity(docs, pruned).collect()}
    for did, _ in CORPUS:
        assert out_pruned[did].n_hits <= out_full[did].n_hits
        assert out_pruned[did].avg_logprob <= out_full[did].avg_logprob + 1e-12


def test_broadcast_model_plan(spark, docs):
    model = train_bigram_lm(docs, k=0.5)
    plan = (
        score_perplexity(docs, model, broadcast_model=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_deterministic(spark, docs):
    model = train_bigram_lm(docs, k=0.5)
    a = sorted(map(tuple, score_perplexity(docs, model).collect()))
    b = sorted(
        map(
            tuple,
            score_perplexity(docs, train_bigram_lm(docs, k=0.5)).collect(),
        )
    )
    assert a == b
