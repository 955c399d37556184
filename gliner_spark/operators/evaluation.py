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
