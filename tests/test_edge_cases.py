"""Edge cases end-to-end: empty/whitespace/long texts, empty label sets,
unicode, and the max_len truncation boundary."""

import pytest
from pyspark.sql import Row

from gliner_spark.config import PipelineConfig
from gliner_spark.kernel.oracle import OraclePipeline
from gliner_spark.kernel.tokenizer import prep_tokens
from gliner_spark.operators.ner import extract_entities
from gliner_spark.operators.relations import extract_triples

LABELS = ["person", "tool"]


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(conv_id="c0", turn_idx=i, text=t) for i, t in enumerate(texts)]
    )


def test_empty_and_whitespace_texts(spark):
    texts = ["", "   ", "\n\t ", "ok", "Alice uses Redis"]
    df = _df(spark, texts)
    oracle = OraclePipeline()
    expected = oracle.run(texts, LABELS)
    got = extract_entities(df, LABELS).collect()
    by_turn = {}
    for r in got:
        by_turn.setdefault(r.turn_idx, []).append(r)
    for i, exp in enumerate(expected):
        assert len(by_turn.get(i, [])) == len(exp)
    # [PAD] guard: no entity may be emitted for empty rows
    assert 0 not in by_turn and 1 not in by_turn and 2 not in by_turn


def test_empty_relation_output_on_entityless_rows(spark):
    df = _df(spark, ["", "the of and to"])
    oracle = OraclePipeline()
    n_oracle = sum(
        len(t) for t in oracle.extract_relations(
            ["", "the of and to"], ["uses"], LABELS)
    )
    assert extract_triples(df, ["uses"], LABELS).count() == n_oracle


def test_truncation_boundary(spark):
    """A text beyond max_len tokens must truncate identically to the
    reference rule (processor.py:349-352) in pipeline and oracle."""
    cfg = PipelineConfig(max_len=16)
    long_text = " ".join(f"w{i}" for i in range(40)) + " Alice"
    toks, starts, ends = prep_tokens(long_text, cfg.max_len)
    assert len(toks) == 16 and toks[0] == "w0" and toks[-1] == "w15"
    df = _df(spark, [long_text])
    oracle = OraclePipeline(cfg)
    exp = oracle.run([long_text], LABELS)[0]
    got = extract_entities(df, LABELS, cfg).collect()
    assert {(r.start, r.end, r.label) for r in got} == {
        (e["start"], e["end"], e["label"]) for e in exp
    }
    # nothing may reference a token beyond the truncation point
    limit_char = ends[-1]
    assert all(r.end <= limit_char for r in got)


def test_unicode_text_parity(spark):
    """Non-ASCII text flows through the Python-re tokenizer identically in
    Spark and oracle (the kernel is Unicode-aware by design; only the
    native corpus-analytics path is ASCII-scoped)."""
    texts = ["汉字 Alice café naïve — Zürich", "données Müller 東京"]
    df = _df(spark, texts)
    oracle = OraclePipeline()
    expected = set()
    for i, ents in enumerate(oracle.run(texts, LABELS)):
        for e in ents:
            expected.add((i, e["start"], e["end"], e["label"], e["text"]))
    got = {
        (r.turn_idx, r.start, r.end, r.label, r.text)
        for r in extract_entities(df, LABELS).collect()
    }
    assert got == expected


def test_single_and_duplicate_labels(spark):
    """Duplicate labels dedupe order-preserving (reference model.py:202)."""
    df = _df(spark, ["Alice uses Redis daily"])
    a = extract_entities(df, ["person", "person", "tool"]).collect()
    b = extract_entities(df, ["person", "tool"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
