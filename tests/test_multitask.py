"""Multitask pipelines (classification / QA / summarization / open
extraction): Spark operators vs the pure-Python oracle."""

import pytest

from gliner_spark.kernel.multitask import OracleMultitask
from gliner_spark.operators.multitask import (
    answer,
    classify,
    open_extract,
    summarize,
)
from gliner_spark.sources.transcripts import synth_transcripts

CLASSES = ["incident report", "smalltalk", "deployment", "question"]


@pytest.fixture(scope="module")
def small_transcripts(spark):
    df = synth_transcripts(spark, n_convs=15).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def keyed_texts(small_transcripts):
    rows = sorted(
        small_transcripts.select("conv_id", "turn_idx", "text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    return [(r.conv_id, r.turn_idx) for r in rows], [r.text for r in rows]


def test_classification_parity(spark, small_transcripts, keyed_texts):
    keys, texts = keyed_texts
    oracle = OracleMultitask()
    expected = dict(zip(keys, oracle.classify(texts, CLASSES)))
    got = {
        (r.conv_id, r.turn_idx): (r.label, r.score)
        for r in classify(small_transcripts, CLASSES).collect()
    }
    assert set(got) == set(expected)
    for k, (lbl, sc) in got.items():
        assert lbl == expected[k]["label"], k
        assert abs(sc - expected[k]["score"]) < 1e-5, k


def test_classification_default_branch(spark, small_transcripts, keyed_texts):
    """At a very high threshold most rows have no prediction → the
    reference's ('other', 1.0) default must appear (classification.py:120)."""
    keys, texts = keyed_texts
    oracle = OracleMultitask()
    expected = dict(zip(keys, oracle.classify(texts, CLASSES, threshold=0.97)))
    got = {
        (r.conv_id, r.turn_idx): (r.label, r.score)
        for r in classify(small_transcripts, CLASSES, threshold=0.97).collect()
    }
    assert got == {k: (v["label"], pytest.approx(v["score"], abs=1e-5))
                   for k, v in expected.items()}
    assert any(lbl == "other" for lbl, _ in got.values())


def test_qa_parity(spark, small_transcripts, keyed_texts):
    keys, texts = keyed_texts
    oracle = OracleMultitask()
    expected = dict(zip(keys, oracle.answer(texts, "what service failed?")))
    got = {}
    for r in answer(small_transcripts, "what service failed?").collect():
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.rank, r.answer, r.score)
        )
    assert sum(len(v) for v in got.values()) > 10
    for k, rows in got.items():
        rows.sort()
        exp = expected[k]
        assert [a for _r, a, _s in rows] == [e["answer"] for e in exp], k
        for (_r, _a, s), e in zip(rows, exp):
            assert abs(s - e["score"]) < 1e-5


def test_summarization_parity(spark, small_transcripts, keyed_texts):
    keys, texts = keyed_texts
    oracle = OracleMultitask()
    expected = dict(zip(keys, oracle.summarize(texts)))
    got = {
        (r.conv_id, r.turn_idx): r.summary
        for r in summarize(small_transcripts).collect()
    }
    assert set(got) == set(expected)
    assert any(v for v in got.values())
    assert got == expected


def test_open_extraction_parity(spark, small_transcripts, keyed_texts):
    keys, texts = keyed_texts
    oracle = OracleMultitask()
    expected = {}
    for k, ents in zip(keys, oracle.open_extract(texts, ["entity", "action"])):
        for e in ents:
            expected[(k[0], k[1], e["start"], e["end"], e["label"])] = e["text"]
    got = {
        (r.conv_id, r.turn_idx, r.start, r.end, r.label): r.text
        for r in open_extract(
            small_transcripts, ["entity", "action"]
        ).collect()
    }
    assert got == expected
    assert len(got) > 10
