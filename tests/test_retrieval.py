"""BM25 ranked retrieval + benchmark decontamination.

The BM25 oracle here is an independent pure-Python restatement of the
Robertson formula (computed with math.log over plain floats), so the
Spark expression tree is checked against hand-auditable arithmetic, not
against itself.
"""

import math

import pytest

from gliner_spark.operators.curation import decontaminate
from gliner_spark.operators.retrieval import bm25_rank

K1, B = 1.2, 0.75

DOCS = [
    (0, "spark shuffle join spark spark"),
    (1, "window scan filter table"),
    (2, "spark window window table row"),
    (3, ""),
    (4, "join join join join"),
]


def _tokens(text):
    return text.lower().split()


def _bm25_oracle(query_terms, top_k):
    toks = {i: _tokens(t) for i, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(v) for v in toks.values()) / n
    out = []
    for i, ts in toks.items():
        dl = len(ts)
        score = 0.0
        for w in query_terms:
            tf = float(ts.count(w))
            df = float(sum(1 for v in toks.values() if w in v))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * dl / avgdl)
            )
        out.append((i, round(score, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:top_k]


@pytest.mark.parametrize(
    "query", [["spark"], ["spark", "window"], ["join", "nosuchterm"]]
)
def test_bm25_matches_python_oracle(spark, query):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r.doc_id, r.score, r.rk)
        for r in bm25_rank(df, query, top_k=3).collect()
    ]
    want = [(i, s, rk + 1) for rk, (i, s) in
            enumerate(_bm25_oracle(query, 3))]
    assert got == want


def test_bm25_zero_df_term_contributes_nothing(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = bm25_rank(df, ["spark"], top_k=5).collect()
    b = bm25_rank(df, ["spark", "nosuchterm"], top_k=5).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b
    ]


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_rank(df, [])


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # shares the 3-grams "alpha beta gamma" + "beta gamma delta"
            (0, "x alpha beta gamma delta y"),
            # shares exactly one 3-gram
            (1, "alpha beta gamma zzz"),
            # bigram overlap only — NOT contaminated at n=3
            (2, "beta gamma unrelated words here"),
            # no overlap
            (3, "totally different text entirely"),
            # doc shorter than n
            (4, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_hit_grams, r.contaminated)
        for r in decontaminate(train, bench, n=3).collect()
    }
    assert got == {
        0: (2, 1),
        1: (1, 1),
        2: (0, 0),
        3: (0, 0),
        4: (0, 0),
    }


def test_decontaminate_counts_distinct_grams_once(spark):
    bench = spark.createDataFrame(
        [(100, "a b c")], "doc_id long, text string"
    )
    # the shared gram occurs twice in the training doc — still 1 hit
    train = spark.createDataFrame(
        [(0, "a b c x a b c")], "doc_id long, text string"
    )
    [row] = decontaminate(train, bench, n=3).collect()
    assert (row.n_hit_grams, row.contaminated) == (1, 1)


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The 100 TB contract: the membership test joins the training gram
    stream against a BROADCAST of the benchmark grams — the big side
    must not be shuffled for it."""
    docs = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma w{i+1}") for i in range(20)],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id % 10 = 0")
    train = docs.where("doc_id % 10 != 0")
    out = decontaminate(train, bench, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
