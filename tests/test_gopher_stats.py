"""gopher_stats: the remaining Gopher rules on planted rule-violating
documents plus a python replay of every ratio."""

import re

import pytest
from pyspark.sql import Row

from gliner_spark.operators.textstats import gopher_stats

TOK = re.compile(r"\w+(?:[-_]\w+)*|\S", re.ASCII)

DOCS = [
    (0, "a normal sentence with regular words here today"),
    (1, "# # # # # tags"),                            # symbol-heavy
    (2, "- one\n- two\n- three\n- four"),             # all bullets
    (3, "first part...\nsecond part…\nplain"),    # ellipsis lines
    (4, ", . ! ? ; :"),                               # no alpha words
    (5, "internationalization supercalifragilistic extraordinarily"),
    (6, ""),                                          # empty
]


def py_gopher(text):
    toks = TOK.findall(text)
    lines = text.split("\n")
    n = len(toks)
    mwl = sum(len(t) for t in toks) / n if n else 0.0
    nsym = text.count("#") + text.count("…")
    symr = nsym / n if n else 0.0
    alphaf = (
        sum(1 for t in toks if re.search("[A-Za-z]", t)) / n if n else 0.0
    )
    bulletf = sum(
        1 for l in lines if re.match(r"^\s*[-*•]", l)
    ) / len(lines)
    ellipsisf = sum(
        1 for l in lines if re.search(r"(\.\.\.|…)\s*$", l)
    ) / len(lines)
    ok = (
        3.0 <= mwl <= 10.0
        and symr <= 0.1
        and alphaf >= 0.8
        and bulletf <= 0.9
        and ellipsisf <= 0.3
    )
    return mwl, symr, alphaf, bulletf, ellipsisf, int(ok)


def test_gopher_stats_matches_python(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS]
    )
    got = {
        r.doc_id: (
            r.mean_word_len,
            r.symbol_word_ratio,
            r.alpha_word_frac,
            r.bullet_line_frac,
            r.ellipsis_line_frac,
            r.gopher_ok,
        )
        for r in gopher_stats(df).collect()
    }
    for i, t in DOCS:
        want = py_gopher(t)
        for g, w in zip(got[i][:5], want[:5]):
            assert g == pytest.approx(w, abs=1e-6), (i, got[i], want)
        assert got[i][5] == want[5], (i, t)


def test_gopher_flags_the_planted_violations(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS]
    )
    ok = {r.doc_id: r.gopher_ok for r in gopher_stats(df).collect()}
    assert ok[0] == 1 and ok[5] == 0  # long words break mean_word_len
    assert ok[1] == 0                 # symbol ratio
    assert ok[2] == 0                 # bullets
    assert ok[3] == 0                 # ellipsis lines
    assert ok[4] == 0                 # no alpha words
    assert ok[6] == 0                 # empty: mean_word_len 0
