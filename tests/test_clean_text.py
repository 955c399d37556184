"""clean_text (operators/textstats.py): C4/ftfy-style unicode cleaning
vs a pure-python replay, NFC composition parity, and the nfc=False
pure-map plan shape.
"""

import re
import unicodedata

from gliner_spark.operators.textstats import (
    CONTROL_CHARS,
    PUNCT_FOLD_FROM,
    PUNCT_FOLD_TO,
    UNICODE_SPACES,
    clean_text,
)

DIRTY = [
    (0, "plain ascii stays put"),
    (1, "Cafe\u0301 compos\u0301e"),                      # decomposed accents
    (2, "a\u00a0b\u2009c\u200bd\u3000e"),               # unicode spaces
    (3, "\u201cquoted\u201d \u2018single\u2019 \u2013 \u2014 \u2212"),
    (4, "ctrl\x07chars\x00here\x1f!"),
    (5, "  runs \t of\n whitespace  "),
    (6, ""),
]


def _py_clean(t: str, nfc: bool = True) -> str:
    t = re.sub(CONTROL_CHARS, "", t)
    t = re.sub(UNICODE_SPACES, " ", t)
    t = t.translate(str.maketrans(PUNCT_FOLD_FROM, PUNCT_FOLD_TO))
    # Java \s is ASCII; python's is unicode — match Java explicitly
    t = re.sub(r"[ \t\n\x0b\x0c\r]+", " ", t).strip(" ")
    if nfc:
        t = unicodedata.normalize("NFC", t)
    return t


def test_matches_python_replay(spark):
    df = spark.createDataFrame(DIRTY, "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_text(df).collect()}
    for doc_id, text in DIRTY:
        row = got[doc_id]
        assert row["norm_text"] == _py_clean(text), (doc_id, row["norm_text"])
        assert row["n_chars_raw"] == len(text)
        assert row["n_chars_norm"] == len(_py_clean(text))


def test_nfc_composes(spark):
    df = spark.createDataFrame([(0, "Cafe\u0301")], "doc_id long, text string")
    row = clean_text(df).collect()[0]
    assert row["norm_text"] == "Caf\u00e9"
    assert row["n_chars_raw"] == 5 and row["n_chars_norm"] == 4


def test_nfc_false_is_pure_codegen_map(spark):
    df = spark.createDataFrame([(0, "x"), (1, "y")], "doc_id long, text string")
    plan = (
        clean_text(df, nfc=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_null_text(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    row = clean_text(df).collect()[0]
    assert row["norm_text"] is None
