"""Semantic (embedding-space) benchmark decontamination: numpy max-cos
replay, planted-leak flags, empty-benchmark guard, and the zero-shuffle
broadcast plan pin."""

import numpy as np
import pytest
from pyspark.sql import Row

from gliner_spark.operators.curation import semantic_decontaminate


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in rows]
    )


def _np_maxcos(train, bench):
    out = {}
    b = np.array([v / np.linalg.norm(v) for _, v in bench])
    for i, v in train:
        u = np.array(v) / np.linalg.norm(v)
        out[i] = float((b @ u).max()) if len(b) else -1.0
    return out


PSEUDO_TRAIN = [
    (i, [((i * j * 7 + j) % 13) - 6.0 for j in range(1, 9)])
    for i in range(20)
]
PSEUDO_BENCH = [
    (100 + i, [((i * j * 5 + 3) % 11) - 5.0 for j in range(1, 9)])
    for i in range(4)
]


def test_semantic_decon_matches_numpy(spark):
    got = {
        r.vec_id: (r.max_cos, r.contaminated)
        for r in semantic_decontaminate(
            _emb(spark, PSEUDO_TRAIN),
            _emb(spark, PSEUDO_BENCH),
            threshold=0.8,
        ).collect()
    }
    want = _np_maxcos(PSEUDO_TRAIN, PSEUDO_BENCH)
    assert set(got) == set(want)
    for k, (mc, flag) in got.items():
        assert mc == pytest.approx(want[k], abs=1e-12)
        assert flag == int(want[k] >= 0.8)


def test_semantic_decon_flags_planted_leaks(spark):
    bench = [(0, [1.0, 0.0, 0.0, 0.0])]
    train = [
        (1, [2.0, 0.0, 0.0, 0.0]),     # same direction: cos 1
        (2, [1.0, 0.1, 0.0, 0.0]),     # near copy: cos ~0.995
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite
    ]
    got = {
        r.vec_id: r.contaminated
        for r in semantic_decontaminate(
            _emb(spark, train), _emb(spark, bench), threshold=0.95
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 0, 4: 0}


def test_semantic_decon_empty_benchmark(spark):
    rows = semantic_decontaminate(
        _emb(spark, PSEUDO_TRAIN),
        _emb(spark, PSEUDO_BENCH).where("vec_id < 0"),
    ).collect()
    assert len(rows) == len(PSEUDO_TRAIN)
    assert all(r.max_cos == -1.0 and r.contaminated == 0 for r in rows)


def test_semantic_decon_train_side_never_shuffles(spark):
    """The benchmark matrix arrives as a one-row broadcast; the train
    side must stay a pure map — the only Exchange in the plan is the
    BroadcastExchange of that single row."""
    df = semantic_decontaminate(
        _emb(spark, PSEUDO_TRAIN), _emb(spark, PSEUDO_BENCH)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the train side is everything between the join and the broadcast
    # build side; the bench side legitimately pays one single-partition
    # Exchange for its collect_list fold — bounded data, not ours
    train_side = plan[
        plan.find("BroadcastNestedLoopJoin"):plan.find("BroadcastExchange")
    ]
    assert "Exchange" not in train_side, train_side
