"""Fused two-pass RE on Spark vs the pure-Python oracle — the triple-level
P/R≥0.95 gate (BASELINE.json north_rule)."""

import pytest

from gliner_spark.kernel.oracle import OraclePipeline
from gliner_spark.operators.relations import extract_triples
from gliner_spark.sources.transcripts import synth_transcripts

ENTITY_TYPES = ["person", "organization", "location", "service", "tool"]
RELATIONS = ["works for", "located in", "uses"]


@pytest.fixture(scope="module")
def small_transcripts(spark):
    df = synth_transcripts(spark, n_convs=30).cache()
    df.count()
    return df


def test_triple_parity_vs_oracle(spark, small_transcripts):
    rows = sorted(
        small_transcripts.select("conv_id", "turn_idx", "text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    oracle = OraclePipeline()
    expected = oracle.extract_relations(
        [r.text for r in rows], RELATIONS, ENTITY_TYPES
    )
    gold = {}
    for r, triples in zip(rows, expected):
        for t in triples:
            gold[
                (
                    r.conv_id,
                    r.turn_idx,
                    t["source"],
                    t["relation"],
                    t["target"],
                    t["start"],
                    t["end"],
                )
            ] = t["score"]

    got_rows = extract_triples(
        small_transcripts, RELATIONS, ENTITY_TYPES
    ).collect()
    got = {
        (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj, t.start, t.end): t.score
        for t in got_rows
    }

    assert len(gold) > 20, "oracle produced too few triples to be meaningful"
    tp = sum(
        1
        for k, sc in got.items()
        if k in gold and abs(gold[k] - sc) < 1e-5
    )
    precision = tp / max(len(got), 1)
    recall = tp / max(len(gold), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall, len(gold))
    assert set(got) == set(gold)


def test_triples_plan_is_shuffle_free(spark, small_transcripts):
    plan = (
        extract_triples(small_transcripts, RELATIONS, ENTITY_TYPES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_triple_subjects_are_pass1_entities(spark, small_transcripts):
    """Every emitted subject must be an entity surface found by pass 1 in
    the SAME turn (reference invariant: labels are built from pass-1
    output, relation_extraction.py:66-75)."""
    from gliner_spark.operators.ner import extract_entities

    ents = extract_entities(small_transcripts, ENTITY_TYPES).select(
        "conv_id", "turn_idx", "text"
    ).distinct()
    triples = extract_triples(small_transcripts, RELATIONS, ENTITY_TYPES)
    dangling = (
        triples.join(
            ents.withColumnRenamed("text", "subj"),
            on=["conv_id", "turn_idx", "subj"],
            how="left_anti",
        ).count()
    )
    assert dangling == 0


def test_pred_is_from_relation_list(spark, small_transcripts):
    triples = extract_triples(small_transcripts, RELATIONS, ENTITY_TYPES)
    preds = {r.pred for r in triples.select("pred").distinct().collect()}
    assert preds <= set(RELATIONS)
    assert len(preds) > 0
