"""Learned quality classifier (operators/classifier.py): distributed
batch GD vs a numpy replay of the identical math, plus separation on a
planted pos/neg vocabulary split."""

import hashlib
import math
import re

import numpy as np
import pytest

from gliner_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)

_PAT = re.compile(r"\w+(?:[-_]\w+)*|\S")
NB = 128


def _buckets(text):
    ts = _PAT.findall(text.lower())
    grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % NB
        for g in grams
    ]


def _numpy_train(rows, iters, lr, l2):
    w = np.zeros(NB + 1)
    n = len(rows)
    for _ in range(iters):
        grad = np.zeros(NB + 1)
        for bs, y in rows:
            m = w[NB] + sum(w[b] for b in bs)
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for b in bs:
                grad[b] += r
            grad[NB] += r
        grad /= n
        w = w - lr * (grad + l2 * w)
    return w


@pytest.fixture(scope="module")
def corpora(spark):
    pos = [(i, f"excellent prose about science topic {i % 5} clearly")
           for i in range(30)]
    neg = [(i, f"buy cheap stuff now click here deal {i % 5} wow")
           for i in range(30)]
    return (
        spark.createDataFrame(pos, "doc_id: bigint, text: string"),
        spark.createDataFrame(neg, "doc_id: bigint, text: string"),
        pos,
        neg,
    )


def test_train_matches_numpy_replay(spark, corpora):
    pos_df, neg_df, pos, neg = corpora
    w = train_quality_classifier(
        pos_df, neg_df, n_buckets=NB, iters=10, lr=0.3, l2=1e-3
    )
    rows = [(_buckets(t), 1.0) for _, t in pos] + [
        (_buckets(t), 0.0) for _, t in neg
    ]
    want = _numpy_train(rows, iters=10, lr=0.3, l2=1e-3)
    assert np.allclose(np.array(w), want, rtol=1e-9, atol=1e-12)


def test_scores_separate_planted_classes(spark, corpora):
    pos_df, neg_df, _, _ = corpora
    w = train_quality_classifier(
        pos_df, neg_df, n_buckets=NB, iters=15, lr=0.5
    )
    ps = [r.quality_prob for r in score_quality(pos_df, w).collect()]
    ns = [r.quality_prob for r in score_quality(neg_df, w).collect()]
    assert min(ps) > max(ns)          # perfect separation on the plant
    assert all(0.0 <= p <= 1.0 for p in ps + ns)
    # scoring preserves input columns
    cols = score_quality(pos_df, w).columns
    assert cols == ["doc_id", "text", "quality_prob"]


def test_empty_training_set_raises(spark, corpora):
    pos_df, _, _, _ = corpora
    import pytest as _pytest

    empty = pos_df.where("doc_id < 0")
    with _pytest.raises(ValueError):
        train_quality_classifier(empty, empty, n_buckets=NB, iters=1)
