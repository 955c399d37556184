"""Tokenizer registry (reference WordsSplitter dispatcher shape,
gliner/data_processing/tokenizer.py:269-296) + config-surface validation
(span_mode registry, span_rep.py:381-421)."""

import pytest

from gliner_spark.config import DEFAULT, PipelineConfig
from gliner_spark.kernel.tokenizer import (
    SPLITTERS,
    get_splitter,
    register_splitter,
    tokenize_with_offsets,
)


def test_registry_covers_reference_splitter_names():
    # every splitter_type string the reference dispatcher accepts resolves
    # here too — in-env implementations or the same ModuleNotFoundError
    # the reference raises when the backing library is missing
    for name in [
        "whitespace", "spacy", "mecab", "jieba", "hanlp", "janome",
        "camel", "hindi", "stanza", "universal",
    ]:
        assert name in SPLITTERS, name


def test_whitespace_default_unchanged():
    toks, starts, ends = tokenize_with_offsets("Ada-Lovelace wrote notes.")
    assert toks == ["Ada-Lovelace", "wrote", "notes", "."]
    assert starts[0] == 0 and ends[0] == len("Ada-Lovelace")
    # default arg = whitespace
    assert tokenize_with_offsets("a b")[0] == ["a", "b"]


def test_cjk_splits_han_runs_per_character():
    text = "清华大学 is in Beijing"
    # the default regex clumps the entire han run into ONE \w+ token …
    assert tokenize_with_offsets(text)[0][0] == "清华大学"
    # … the cjk splitter yields one token per han char, latin unchanged
    toks, starts, ends = tokenize_with_offsets(text, "cjk")
    assert toks == ["清", "华", "大", "学", "is", "in", "Beijing"]
    assert starts[:4] == [0, 1, 2, 3] and ends[:4] == [1, 2, 3, 4]
    # offsets still index the ORIGINAL string
    for t, s, e in zip(toks, starts, ends):
        assert text[s:e] == t


def test_cjk_handles_kana_and_hangul():
    assert tokenize_with_offsets("トヨタ自動車", "cjk")[0] == [
        "ト", "ヨ", "タ", "自", "動", "車",
    ]
    assert tokenize_with_offsets("삼성전자", "cjk")[0] == [
        "삼", "성", "전", "자",
    ]


def test_universal_dispatches_per_text():
    # CJK present → per-char; pure latin → exact whitespace behavior
    assert tokenize_with_offsets("你好 world", "universal")[0] == [
        "你", "好", "world",
    ]
    latin = "Ada-Lovelace wrote notes."
    assert (
        tokenize_with_offsets(latin, "universal")
        == tokenize_with_offsets(latin, "whitespace")
    )


def test_library_gated_splitters_raise_module_not_found():
    """Every library-backed registry name fails exactly like the
    reference when its library is absent: ModuleNotFoundError whose
    message leads with the reference's convention
    'Please install <pkg> with: `pip install <pkg>`'
    (gliner/data_processing/tokenizer.py:27,42,59,75,92,109,129)."""
    pkg = {
        "spacy": "spacy", "jieba": "jieba", "hanlp": "hanlp",
        "mecab": "python-mecab-ko", "janome": "janome",
        "camel": "camel-tools", "hindi": "indic-nlp-library",
        "stanza": "stanza",
    }
    for name, module in pkg.items():
        with pytest.raises(ModuleNotFoundError) as ei:
            get_splitter(name)
        msg = str(ei.value)
        assert msg.startswith(
            f"Please install {module} with: `pip install {module}`"
        ), msg


def test_unknown_splitter_rejected():
    with pytest.raises(ValueError, match="unknown splitter"):
        get_splitter("nope")
    with pytest.raises(ValueError, match="not registered"):
        PipelineConfig(tokenizer="nope")


def test_register_splitter_extension_hook():
    register_splitter("upper_words", lambda: (
        lambda text: (
            (w.upper(), i, i + len(w))
            for i, w in [(text.find(w), w) for w in text.split()]
        )
    ))
    try:
        toks, _s, _e = tokenize_with_offsets("ab cd", "upper_words")
        assert toks == ["AB", "CD"]
        assert PipelineConfig(tokenizer="upper_words").tokenizer == "upper_words"
    finally:
        SPLITTERS.pop("upper_words", None)


def test_span_mode_validation():
    assert DEFAULT.span_mode == "markerV0"
    # every reference-registry mode is now implemented (kernel/span_rep)
    from gliner_spark.config import SPAN_MODES_IMPLEMENTED

    for mode in SPAN_MODES_IMPLEMENTED:
        assert PipelineConfig(span_mode=mode).span_mode == mode
    # not a reference mode at all
    with pytest.raises(ValueError, match="not a reference span mode"):
        PipelineConfig(span_mode="bogus")


def test_zh_extraction_parity_spark_vs_oracle(spark):
    """With tokenizer='cjk' the Spark path and the pure-Python oracle must
    emit the IDENTICAL span set over Chinese text, and spans must index
    characters (the whitespace regex would produce one giant token)."""
    from gliner_spark.kernel.oracle import OraclePipeline
    from gliner_spark.operators.ner import extract_entities

    cfg = PipelineConfig(tokenizer="cjk", threshold=0.3)
    labels = ["person", "organization", "location"]
    texts = [
        "张伟在清华大学工作。",
        "李娜访问了北京和上海。",
        "ACME 公司聘用了王芳。",
    ]
    rows = [(f"c{i}", 0, "user", t, None, None) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    expected = OraclePipeline(cfg).run(texts, labels, threshold=0.3)
    gold = {
        (f"c{i}", e["start"], e["end"], e["label"], e["text"])
        for i, ents in enumerate(expected)
        for e in ents
    }
    got = {
        (r.conv_id, r.start, r.end, r.label, r.text)
        for r in extract_entities(df, labels, cfg=cfg).collect()
    }
    assert got == gold
    assert len(gold) > 0, "hash scorer emitted nothing at threshold 0.3"
    # every zh span is over per-character tokens: width in chars == width
    # in tokens is not required, but spans must never cover the WHOLE
    # clause the way one-clump tokenization would
    assert all(e - s <= 12 for _c, s, e, _l, _t in gold)
