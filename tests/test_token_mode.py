"""Token-level decode path: vectorized decode vs literal reference
restatement (property test), and Spark operator vs oracle parity."""

import numpy as np
import pytest

from gliner_spark.kernel.decode import decode_row_token, token_decode_reference
from gliner_spark.kernel.oracle import OraclePipeline
from gliner_spark.operators.ner import extract_entities_token
from gliner_spark.sources.transcripts import synth_transcripts

LABELS = ["person", "organization", "tool"]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("flat_ner", [True, False])
def test_vectorized_token_decode_matches_reference(seed, flat_ner):
    rng = np.random.RandomState(seed)
    L, C = 14, 3
    probs = rng.beta(0.6, 0.6, size=(L, C, 3)).astype(np.float32)
    got = decode_row_token(probs, L, 0.5, flat_ner=flat_ner)
    exp = token_decode_reference(probs, L, 0.5, flat_ner=flat_ner)
    assert [(s, e, c) for s, e, c, _ in got] == [
        (s, e, c) for s, e, c, _ in exp
    ]
    for g, x in zip(got, exp):
        assert abs(g[3] - x[3]) < 1e-7


def test_token_decode_respects_n_tokens():
    rng = np.random.RandomState(0)
    probs = rng.beta(0.6, 0.6, size=(10, 2, 3)).astype(np.float32)
    spans = decode_row_token(probs, 4, 0.5)
    assert all(e <= 3 for _s, e, _c, _sc in spans)


def test_spark_token_mode_matches_oracle(spark):
    df = synth_transcripts(spark, n_convs=12).cache()
    rows = sorted(
        df.select("conv_id", "turn_idx", "text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    oracle = OraclePipeline()
    expected = {}
    for r, ents in zip(rows, oracle.run_token([r.text for r in rows], LABELS)):
        for e in ents:
            expected[(r.conv_id, r.turn_idx, e["start"], e["end"], e["label"])] = e
    got_rows = extract_entities_token(df, LABELS).collect()
    got = {(r.conv_id, r.turn_idx, r.start, r.end, r.label): r
           for r in got_rows}
    assert len(expected) > 10, "token scorer produced too few spans"
    assert set(got) == set(expected)
    for k, r in got.items():
        assert r.text == expected[k]["text"]
        assert abs(r.score - expected[k]["score"]) < 1e-5
