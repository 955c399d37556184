"""Curation workflow (k-fold splits + gold-span confidence annotation) —
reference create_confidence_splits.py semantics."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.config import PipelineConfig
from gliner_spark.operators.curation import (
    confidence_splits,
    kfold_assign,
    score_gold_spans,
)
from gliner_spark.operators.ner import extract_entities_token
from gliner_spark.sources.transcripts import synth_transcripts

LABELS = ["person", "organization", "tool"]


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synth_transcripts(spark, n_convs=30).cache()
    df.count()
    return df


def test_kfold_deterministic_partition(spark, transcripts):
    k = 5
    a = kfold_assign(transcripts, k)
    rows = a.select("conv_id", "turn_idx", "fold").collect()
    # every example in exactly one fold, all folds in range and present
    assert all(0 <= r.fold < k for r in rows)
    assert len({r.fold for r in rows}) == k
    b = {(r.conv_id, r.turn_idx): r.fold
         for r in kfold_assign(transcripts, k).collect()}
    assert all(b[(r.conv_id, r.turn_idx)] == r.fold for r in rows)
    # a different seed shuffles examples across folds
    c = {(r.conv_id, r.turn_idx): r.fold
         for r in kfold_assign(transcripts, k, seed=7).collect()}
    assert any(c[key] != fold for key, fold in
               ((k_, v) for k_, v in b.items()))
    with pytest.raises(ValueError, match="folds"):
        kfold_assign(transcripts, k=1)


def test_gold_confidence_reproduces_token_decode_scores(spark, transcripts):
    """Feeding the token-mode decoder's own spans back as gold must
    reproduce their scores exactly: the decoder's span score IS
    min(inside.. , start, end) at the same threshold, and decoded spans
    are already non-overlapping so greedy keeps them all."""
    thr = 0.5
    pred = extract_entities_token(transcripts, LABELS, threshold=thr)
    gold = pred.select("conv_id", "turn_idx", "tok_start", "tok_end", "label")
    expected = {
        (r.conv_id, r.turn_idx, r.tok_start, r.tok_end, r.label):
            round(r.score, 9)
        for r in pred.collect()
    }
    assert len(expected) > 20
    got = {
        (r.conv_id, r.turn_idx, r.tok_start, r.tok_end, r.label):
            round(r.confidence, 9)
        for r in score_gold_spans(
            transcripts, gold, LABELS, threshold=thr
        ).collect()
    }
    assert got == expected


def test_gold_spans_filtered_like_reference(spark, transcripts):
    one = transcripts.limit(1).select("conv_id", "turn_idx")
    bad_gold = one.select(
        "conv_id",
        "turn_idx",
        F.explode(
            F.array(
                # out of range / inverted / unknown label — all dropped
                F.struct(F.lit(-1).alias("tok_start"), F.lit(0).alias("tok_end"),
                         F.lit("person").alias("label")),
                F.struct(F.lit(3).alias("tok_start"), F.lit(1).alias("tok_end"),
                         F.lit("person").alias("label")),
                F.struct(F.lit(0).alias("tok_start"), F.lit(99999).alias("tok_end"),
                         F.lit("person").alias("label")),
                F.struct(F.lit(0).alias("tok_start"), F.lit(1).alias("tok_end"),
                         F.lit("no_such_type").alias("label")),
            )
        ).alias("g"),
    ).select("conv_id", "turn_idx", "g.tok_start", "g.tok_end", "g.label")
    assert score_gold_spans(transcripts, bad_gold, LABELS).count() == 0
    # an impossible threshold drops everything (sigmoid probs < 1)
    ok_gold = one.select(
        "conv_id", "turn_idx",
        F.lit(0).alias("tok_start"), F.lit(1).alias("tok_end"),
        F.lit("person").alias("label"),
    )
    assert score_gold_spans(
        transcripts, ok_gold, LABELS, threshold=1.0
    ).count() == 0


def test_confidence_splits_table(spark, transcripts):
    pred = extract_entities_token(transcripts, LABELS, threshold=0.5)
    gold = pred.select("conv_id", "turn_idx", "tok_start", "tok_end", "label")
    out = confidence_splits(transcripts, gold, LABELS, k=4, threshold=0.5)
    rows = out.collect()
    n_examples = gold.select("conv_id", "turn_idx").distinct().count()
    assert len(rows) == n_examples
    assert all(0 <= r.fold < 4 for r in rows)
    assert all(r.n_spans > 0 for r in rows)  # gold came from the decoder
    assert all(
        r.min_confidence is not None
        and r.min_confidence <= r.mean_confidence + 1e-12
        for r in rows
    )
    # a crushing threshold keeps every example visible with n_spans = 0
    empty = confidence_splits(
        transcripts, gold, LABELS, k=4, threshold=1.0
    ).collect()
    assert len(empty) == n_examples
    assert all(r.n_spans == 0 and r.min_confidence is None for r in empty)
