"""Distributed evaluation operators vs kernel metric functions."""

import pytest
from pyspark.sql import Row

from gliner_spark.kernel.metrics import compute_prf_micro, triple_prf
from gliner_spark.kernel.tokenizer import char_span_to_word_span
from gliner_spark.operators.evaluation import (
    evaluate_ner,
    evaluate_ner_per_type,
    evaluate_triples,
)

GOLD = [
    [(0, 5, "person"), (10, 14, "tool")],
    [(3, 8, "person")],
    [],
    [(1, 4, "location"), (1, 4, "location")],  # duplicate — set-counted once
]
PRED = [
    [(0, 5, "person"), (10, 14, "org")],
    [(3, 8, "person"), (9, 12, "tool")],
    [(2, 6, "tool")],
    [(1, 4, "location")],
]


def _df(spark, data):
    rows = [
        Row(sample_id=i, start=s, end=e, label=t)
        for i, ents in enumerate(data)
        for s, e, t in ents
    ]
    return spark.createDataFrame(rows)


def test_evaluate_ner_matches_kernel(spark):
    exp = compute_prf_micro(GOLD, PRED)
    row = evaluate_ner(_df(spark, GOLD), _df(spark, PRED)).collect()[0]
    assert row.precision == pytest.approx(exp["precision"], abs=1e-6)
    assert row.recall == pytest.approx(exp["recall"], abs=1e-6)
    assert row.f1 == pytest.approx(exp["f_score"], abs=1e-6)
    assert row.tp == 3 and row.n_true == 4 and row.n_pred == 6


def test_evaluate_ner_per_type(spark):
    rows = {r.label: r for r in evaluate_ner_per_type(
        _df(spark, GOLD), _df(spark, PRED)).collect()}
    assert rows["person"].tp == 2
    assert rows["person"].precision == 1.0 and rows["person"].recall == 1.0
    assert rows["tool"].tp == 0 and rows["tool"].n_pred == 2
    assert rows["org"].n_true == 0 and rows["org"].precision == 0.0
    assert rows["location"].tp == 1 and rows["location"].n_true == 1


def test_evaluate_triples_matches_kernel(spark):
    pred = [("a", "uses", "b"), ("a", "uses", "c"), ("x", "in", "y")]
    gold = [("a", "uses", "b"), ("x", "in", "y"), ("q", "in", "z")]
    exp = triple_prf(
        [f"{s} <> {p} <> {o}" for s, p, o in pred],
        [f"{s} <> {p} <> {o}" for s, p, o in gold],
    )
    pdf = spark.createDataFrame([Row(subj=s, pred=p, obj=o) for s, p, o in pred])
    gdf = spark.createDataFrame([Row(subj=s, pred=p, obj=o) for s, p, o in gold])
    row = evaluate_triples(pdf, gdf).collect()[0]
    assert (row.tp, row.fp, row.fn) == (
        exp["true positives"], exp["false positives"], exp["false negatives"])
    assert row.f1 == pytest.approx(exp["f1"], abs=1e-6)


def test_char_span_to_word_span():
    text = "Alice Chen uses payment-service daily."
    #       0123456789...
    assert char_span_to_word_span(text, 0, 10) == (0, 1)     # "Alice Chen"
    assert char_span_to_word_span(text, 16, 31) == (3, 3)    # payment-service
    assert char_span_to_word_span(text, 6, 9) == (1, 1)      # inside "Chen"
    assert char_span_to_word_span(text, 37, 38) == (5, 5)    # "."
    assert char_span_to_word_span("", 0, 3) is None


# ---------------------------------------------------------- calibration


def test_calibration_table_matches_python(spark):
    from gliner_spark.operators.evaluation import (
        calibration_table,
        expected_calibration_error,
    )

    rows = []
    for i in range(500):
        s = ((i * 37) % 100) / 100.0
        c = 1 if ((i * 13) % 100) / 100.0 < s else 0  # roughly calibrated
        rows.append((i, s, c))
    df = spark.createDataFrame(rows, "id long, score double, correct int")
    tab = calibration_table(df, n_bins=10)
    got = {
        r["bin"]: (r["n"], r["n_correct"], r["accuracy"])
        for r in tab.collect()
    }
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0.0])
    for _i, s, c in rows:
        b = min(int(s * 10), 9)
        exp[b][0] += 1
        exp[b][1] += c
        exp[b][2] += s
    for b, (n, nc, ssum) in exp.items():
        assert got[b][0] == n and got[b][1] == nc
        assert abs(got[b][2] - nc / n) < 1e-12
    ece = expected_calibration_error(tab)
    exp_ece = sum(
        n * abs(nc / n - round(ssum / n, 6)) for n, nc, ssum in exp.values()
    ) / sum(n for n, _nc, _s in exp.values())
    assert abs(ece - exp_ece) < 1e-9


def test_calibration_top_bin_and_perfect_scorer(spark):
    from gliner_spark.operators.evaluation import (
        calibration_table,
        expected_calibration_error,
    )

    df = spark.createDataFrame(
        [(0, 1.0, 1), (1, 1.0, 1), (2, 0.0, 0)],
        "id long, score double, correct int",
    )
    tab = calibration_table(df, n_bins=5)
    got = {r["bin"]: r["n"] for r in tab.collect()}
    assert got == {4: 2, 0: 1}  # score 1.0 clamps into the top bin
    assert expected_calibration_error(tab) < 1e-12
