"""Span-rep mode registry (reference span_rep.py:381-421): all 11
registry modes implemented in the kernel; per-mode structural properties
(which tokens a span's rep may depend on) + kernel↔Spark parity."""

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
    # the full reference registry (span_rep.py:381-421) is implemented
    assert set(SPAN_MODES_IMPLEMENTED) == set(SPAN_MODES_REFERENCE)
    assert len(SPAN_MODES_REFERENCE) == 11
    for mode in SPAN_MODES_IMPLEMENTED:
        PipelineConfig(span_mode=mode)
        ScorerConfig(span_mode=mode)
    with pytest.raises(ValueError):
        PipelineConfig(span_mode="no_such_mode")
    with pytest.raises(ValueError):
        ScorerConfig(span_mode="conv_normal")  # block-internal name, not registered


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
    modes = list(reps)
    for i, a in enumerate(modes):
        for b in modes[i + 1 :]:
            assert not np.allclose(reps[a], reps[b]), f"{a} == {b}"
    # deterministic per mode (fresh scorer instance, same values)
    for mode in ("mlp", "conv_share", "markerV1"):
        sc2 = HashedBiEncoder(ScorerConfig(span_mode=mode))
        ids, _ = sc2.ids_matrix([toks])
        assert np.array_equal(
            reps[mode], sc2.score_batch(ids, sc2.encode_labels(LABELS), 6)
        )


def _probs(mode, toks, max_width=4):
    sc = HashedBiEncoder(ScorerConfig(span_mode=mode))
    ids, _ = sc.ids_matrix([toks])
    return sc.score_batch(ids, sc.encode_labels(LABELS), max_width)


@pytest.mark.parametrize("mode", ["mlp", "query", "cat"])
def test_start_token_only_modes(mode):
    """SpanMLP/SpanQuery/SpanCAT (span_rep.py:7-81) build the width-k rep
    from token s alone — changing LATER tokens must not move the span's
    scores."""
    a = "alice reviewed the merge request".split()
    b = "alice deployed new staging cluster".split()
    pa, pb = _probs(mode, a), _probs(mode, b)
    assert np.array_equal(pa[0, 0, :, :], pb[0, 0, :, :])
    # and the rep is width-dependent (distinct tables per width)
    assert not np.allclose(pa[0, 0, 0, :], pa[0, 0, 1, :])


@pytest.mark.parametrize(
    "mode", ["conv_mean", "conv_sum", "conv_max", "conv_conv", "conv_share"]
)
def test_conv_modes_window_dependence(mode):
    """SpanConv/ConvShare (span_rep.py:84-200) pool/convolve the width
    window s..s+k: an INTERIOR token change moves the rep (unlike
    marker), and a change PAST the span end does not."""
    base = "alice acme corp bob review".split()
    interior = "alice nova corp bob review".split()
    after = "alice acme corp bob deploy".split()
    p0, pi, pa = _probs(mode, base), _probs(mode, interior), _probs(mode, after)
    # span (0, 3): covers tokens 0..3 — interior token 1 differs
    assert not np.array_equal(p0[0, 0, 3, :], pi[0, 0, 3, :])
    # span (0, 3) does not cover token 4
    assert np.array_equal(p0[0, 0, 3, :], pa[0, 0, 3, :])
    # width 0 is the raw token rep: token 0 unchanged everywhere
    assert np.array_equal(p0[0, 0, 0, :], pi[0, 0, 0, :])


def test_markerv1_first_token_augmentation():
    """SpanMarkerV1 (span_rep.py:288-349): rep = endpoints + a
    first-token term (the documented intent; the reference body's
    padded-batch mean is a batch-shape-dependent quirk this kernel does
    not reproduce — see _markerv1_tables). Changing token 0 must move a
    span that does not even contain it; interior changes must not."""
    base = "alice acme corp bob review".split()
    first = "carol acme corp bob review".split()
    interior = "alice acme labs bob review".split()
    p0 = _probs("markerV1", base)
    pf = _probs("markerV1", first)
    pi = _probs("markerV1", interior)
    # span (1, 2) = tokens 1..3: first token is outside it, yet its
    # projection is part of every rep
    assert not np.array_equal(p0[0, 1, 2, :], pf[0, 1, 2, :])
    # interior token 2 is not an endpoint of span (1, 3)... span (1,3)
    # covers tokens 1..4 with endpoints 1 and 4 — token 2 is interior
    assert np.array_equal(p0[0, 1, 3, :], pi[0, 1, 3, :])


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


def test_all_modes_fire_through_oracle_decode():
    """Every mode must actually emit entities through the full
    tokenize→score→greedy-decode path (a mode whose calibration never
    clears threshold would make parity tests vacuous)."""
    texts = [
        "alice works for acme corp in berlin",
        "bob reviewed the deploy tool for nova labs",
        "carol met dave at the paris office of initech",
    ] * 4
    for mode in SPAN_MODES_IMPLEMENTED:
        oracle = OraclePipeline(PipelineConfig(span_mode=mode))
        ents = oracle.run(texts, LABELS)
        n = sum(len(e) for e in ents)
        assert n > 0, f"mode {mode} decoded zero entities"


@pytest.mark.parametrize(
    "mode", ["marker", "mlp", "markerV1", "query", "conv_mean", "conv_share"]
)
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
