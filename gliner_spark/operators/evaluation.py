"""Distributed evaluation operators — the reference's eval query (SURVEY
§3.3) as reusable DataFrame transforms.

 evaluate_ner      gold × pred entity DataFrames → one-row micro P/R/F1
                   (reference Evaluator: set-dedup of (type, span, sample)
                   tuples, evaluator.py:52-84 + compute_prf :87-121; the
                   set semantics mean duplicates within a side count once,
                   hence the distinct() before counting).
 evaluate_ner_per_type
                   per-entity-type TP/pred/true + P/R/F1 (the per-class
                   table `compute_prf` emits before micro-averaging).
 evaluate_triples  set-based triple P/R/F1 over "s <> r <> t" identity
                   (relation_extraction.py:240-269) via distinct + inner/
                   anti joins.

All are equi-joins + hash aggregates — Catalyst plans broadcast joins
automatically when one side (usually gold) is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENT_KEY = ["sample_id", "start", "end", "label"]


def _prf(tp, n_pred, n_true):
    prec = F.when(n_pred > 0, tp / n_pred).otherwise(0.0)
    rec = F.when(n_true > 0, tp / n_true).otherwise(0.0)
    f1 = F.when((prec + rec) > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return prec, rec, f1


def evaluate_ner(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """gold/pred: (sample_id, start, end, label, …) → one row
    (n_true, n_pred, tp, precision, recall, f1), micro-averaged."""
    g = gold.select(*_ENT_KEY).distinct()
    p = pred.select(*_ENT_KEY).distinct()
    tp_df = g.join(p, on=_ENT_KEY, how="inner")
    counts = (
        g.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_pred")))
        .crossJoin(tp_df.agg(F.count(F.lit(1)).alias("tp")))
    )
    prec, rec, f1 = _prf(F.col("tp"), F.col("n_pred"), F.col("n_true"))
    return counts.select(
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def evaluate_ner_per_type(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """→ per-label (label, n_true, n_pred, tp, precision, recall, f1)."""
    g = gold.select(*_ENT_KEY).distinct()
    p = pred.select(*_ENT_KEY).distinct()
    nt = g.groupBy("label").agg(F.count(F.lit(1)).alias("n_true"))
    np_ = p.groupBy("label").agg(F.count(F.lit(1)).alias("n_pred"))
    tp = (
        g.join(p, on=_ENT_KEY, how="inner")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    out = (
        nt.join(np_, "label", "full")
        .join(tp, "label", "full")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec, rec, f1 = _prf(F.col("tp"), F.col("n_pred"), F.col("n_true"))
    return out.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def evaluate_triples(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """pred/gold: (subj, pred, obj, …) → one row with tp/fp/fn + P/R/F1
    over the canonical "s <> r <> t" identity."""
    key = F.concat_ws(" <> ", "subj", "pred", "obj").alias("t")
    p = pred.select(key).distinct()
    g = gold.select(key).distinct()
    counts = (
        p.agg(F.count(F.lit(1)).alias("n_pred"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_true")))
        .crossJoin(
            p.join(g, "t", "inner").agg(F.count(F.lit(1)).alias("tp"))
        )
    )
    prec, rec, f1 = _prf(F.col("tp"), F.col("n_pred"), F.col("n_true"))
    return counts.select(
        F.col("tp"),
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_true") - F.col("tp")).alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def calibration_table(
    scored: DataFrame,
    score_col: str = "score",
    correct_col: str = "correct",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for confidence calibration (Guo et al. 2017):
    predictions bucketed into fixed-width confidence bins →
    (bin, n, n_correct, mean_score, accuracy, gap). A well-calibrated
    scorer has accuracy ≈ mean confidence per bin; `gap` is the
    per-bin |difference| that `expected_calibration_error` weights.

    ONE map-side-combining hash agg on the bin id; bin = floor(s·B)
    clamped into [0, B) so s = 1.0 lands in the top bin. n, n_correct
    and the accuracy ratio are exact integers / int ratios (bit-stable
    cross-engine); mean_score is a float average (rounded 6dp,
    aggregation-order sensitive in the last bits — the reason oracle
    checks pin the integer columns)."""
    if n_bins < 2:
        raise ValueError("n_bins >= 2")
    # clamp BOTH ends: s = 1.0 belongs in the top bin, and an
    # out-of-range score (a logit passed by mistake) must not create
    # negative bin ids silently
    b = F.greatest(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(int(n_bins) - 1),
        ),
        F.lit(0),
    )
    agg = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(correct_col).cast("int")).alias("n_correct"),
        F.avg(F.col(score_col)).alias("_ms"),
    )
    acc = F.col("n_correct").cast("double") / F.col("n")
    return agg.select(
        "bin",
        "n",
        "n_correct",
        F.round("_ms", 6).alias("mean_score"),
        acc.alias("accuracy"),
        F.round(F.abs(acc - F.col("_ms")), 6).alias("gap"),
    )


def expected_calibration_error(table: DataFrame) -> float:
    """ECE = Σ_b (n_b/N)·|acc_b − conf_b| over a `calibration_table`
    result — one ≤n_bins-row collect."""
    rows = table.select("n", "accuracy", "mean_score").collect()
    total = sum(r["n"] for r in rows)
    if not total:
        return 0.0
    return sum(
        r["n"] * abs(r["accuracy"] - r["mean_score"]) for r in rows
    ) / total
