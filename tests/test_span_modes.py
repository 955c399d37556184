"""Span-rep mode registry (reference span_rep.py:381-421): markerV0 /
marker / mlp implemented, kernel↔Spark parity per mode; other registry
names validated-rejected."""

import numpy as np
import pytest

from gliner_spark.config import (
    SPAN_MODES_IMPLEMENTED,
    SPAN_MODES_REFERENCE,
    PipelineConfig,
    ScorerConfig,
)
from gliner_spark.kernel.oracle import OraclePipeline
from gliner_spark.kernel.scorer import HashedBiEncoder
from gliner_spark.operators.ner import extract_entities
from gliner_spark.sources.transcripts import synth_transcripts

LABELS = ["person", "organization", "tool"]


def test_registry_validation():
    assert set(SPAN_MODES_IMPLEMENTED) == {"markerV0", "marker", "mlp"}
    for mode in SPAN_MODES_IMPLEMENTED:
        PipelineConfig(span_mode=mode)
        ScorerConfig(span_mode=mode)
    for mode in SPAN_MODES_REFERENCE:
        if mode in SPAN_MODES_IMPLEMENTED:
            continue
        with pytest.raises(ValueError, match="span mode|span_mode"):
            PipelineConfig(span_mode=mode)
    with pytest.raises(ValueError):
        PipelineConfig(span_mode="no_such_mode")


def test_pipeline_config_threads_mode_to_scorer():
    cfg = PipelineConfig(span_mode="marker")
    assert cfg.scorer.span_mode == "marker"
    # default untouched
    assert PipelineConfig().scorer.span_mode == "markerV0"


def test_modes_produce_distinct_scores():
    toks = "alice reviewed the merge request for bob".split()
    reps = {}
    for mode in SPAN_MODES_IMPLEMENTED:
        sc = HashedBiEncoder(ScorerConfig(span_mode=mode))
        ids, _ = sc.ids_matrix([toks])
        labels = sc.encode_labels(LABELS)
        reps[mode] = sc.score_batch(ids, labels, 6)
    assert not np.allclose(reps["markerV0"], reps["marker"])
    assert not np.allclose(reps["markerV0"], reps["mlp"])
    assert not np.allclose(reps["marker"], reps["mlp"])
    # deterministic per mode
    sc2 = HashedBiEncoder(ScorerConfig(span_mode="mlp"))
    ids, _ = sc2.ids_matrix([toks])
    assert np.array_equal(
        reps["mlp"], sc2.score_batch(ids, sc2.encode_labels(LABELS), 6)
    )


def test_mlp_rep_depends_only_on_start_token():
    """Reference SpanMLP (span_rep.py:33-50): span_rep = mlp(h).view(B, L,
    K, D) — the rep of span (s, s+k) is a function of token s alone, so
    changing LATER tokens must not move the span's scores."""
    sc = HashedBiEncoder(ScorerConfig(span_mode="mlp"))
    a = "alice reviewed the merge request".split()
    b = "alice deployed new staging cluster".split()
    labels = sc.encode_labels(LABELS)
    ids_a, _ = sc.ids_matrix([a])
    ids_b, _ = sc.ids_matrix([b])
    pa = sc.score_batch(ids_a, labels, 4)
    pb = sc.score_batch(ids_b, labels, 4)
    # spans starting at token 0 ('alice') score identically for every
    # width, even though tokens 1.. differ entirely
    assert np.array_equal(pa[0, 0, :, :], pb[0, 0, :, :])
    # markerV0 (endpoint-dependent) must NOT have that property
    sc0 = HashedBiEncoder(ScorerConfig(span_mode="markerV0"))
    q = sc0.score_batch(ids_a, sc0.encode_labels(LABELS), 4)
    r = sc0.score_batch(ids_b, sc0.encode_labels(LABELS), 4)
    assert not np.array_equal(q[0, 0, 1:, :], r[0, 0, 1:, :])


def test_marker_rep_is_endpoint_only():
    """SpanMarker builds reps from projected start/end tokens only —
    changing an interior token leaves the span rep untouched."""
    sc = HashedBiEncoder(ScorerConfig(span_mode="marker"))
    labels = sc.encode_labels(LABELS)
    a = "alice acme corp bob".split()
    b = "alice nova corp bob".split()
    ids_a, _ = sc.ids_matrix([a])
    ids_b, _ = sc.ids_matrix([b])
    pa = sc.score_batch(ids_a, labels, 4)
    pb = sc.score_batch(ids_b, labels, 4)
    # span (0, 3) covers tokens 0..3; interior token 1 differs
    assert np.array_equal(pa[0, 0, 3, :], pb[0, 0, 3, :])


@pytest.mark.parametrize("mode", ["marker", "mlp"])
def test_kernel_spark_parity_per_mode(spark, mode):
    """Same gate as test_extraction_parity, per span mode: the Spark
    operator and the pure-Python oracle share the scorer, so span sets
    must match exactly."""
    cfg = PipelineConfig(span_mode=mode)
    df = synth_transcripts(spark, n_convs=15).cache()
    rows = sorted(
        df.select("conv_id", "turn_idx", "text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    oracle = OraclePipeline(cfg)
    expected = oracle.run([r.text for r in rows], LABELS)
    gold = {
        (r.conv_id, r.turn_idx, e["start"], e["end"], e["label"])
        for r, ents in zip(rows, expected)
        for e in ents
    }
    got = {
        (e.conv_id, e.turn_idx, e.start, e.end, e.label)
        for e in extract_entities(df, LABELS, cfg=cfg).collect()
    }
    assert len(gold) > 10, f"mode {mode} produced too few entities"
    assert got == gold
    df.unpersist()
