"""JL random projection: exact python replay of the md5 sign matrix and
fold order, the JL inner-product preservation property at a fixed seed,
and the pure-map plan pin."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import Row

from gliner_spark.operators.similarity import jl_signs, random_project


def py_signs(out_dim, in_dim, seed):
    out = []
    for j in range(out_dim):
        for i in range(in_dim):
            h = hashlib.md5(f"{seed}|rp|{j}|{i}".encode()).hexdigest()
            out.append(1.0 if int(h[:8], 16) / 2**32 >= 0.5 else -1.0)
    return out


def py_project(vecs, out_dim, seed):
    d = len(vecs[0][1])
    s = py_signs(out_dim, d, seed)
    res = {}
    for vid, v in vecs:
        n = math.sqrt(sum(x * x for x in v))
        u = [x / n for x in v]
        proj = []
        for j in range(out_dim):
            acc = 0.0
            for i in range(d):
                acc += u[i] * s[j * d + i]
            proj.append(acc * (1.0 / math.sqrt(out_dim)))
        res[vid] = proj
    return res


VECS = [
    (i, [((i * j * 3 + j + 1) % 17) - 8.0 for j in range(16)])
    for i in range(12)
]


def test_random_project_matches_python_bitwise(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in VECS]
    )
    got = {
        r.vec_id: list(r.proj)
        for r in random_project(df, out_dim=8, seed=11).collect()
    }
    want = py_project(VECS, 8, 11)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], k  # bit-exact, not approx


def test_jl_preserves_inner_products(spark):
    # 64-d unit vectors projected to 24-d: max pairwise inner-product
    # distortion stays within the JL ballpark (deterministic: fixed
    # seed, fixed data)
    rng = np.random.default_rng(5)
    raw = rng.normal(size=(30, 64))
    vecs = [(i, [float(x) for x in raw[i]]) for i in range(30)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs]
    )
    proj = {
        r.vec_id: np.array(r.proj)
        for r in random_project(df, out_dim=24, seed=3).collect()
    }
    unit = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    # the 1/sqrt(k) scaling makes <Pa, Pb> an unbiased estimate of <a, b>
    errs = [
        abs(float(unit[a] @ unit[b]) - float(proj[a] @ proj[b]))
        for a in range(30)
        for b in range(a + 1, 30)
    ]
    # eps ~ sqrt(log n / k) ~ 0.38 typical for 435 pairs at k=24; the
    # max tail runs higher — deterministic at this seed (max 0.609)
    assert max(errs) < 0.7 and float(np.mean(errs)) < 0.2
    # unit vectors keep ~unit squared norm in expectation
    sq = [float(p @ p) for p in proj.values()]
    assert 0.6 < float(np.mean(sq)) < 1.4


def test_random_project_is_a_pure_map(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in VECS]
    )
    out = random_project(df, out_dim=4, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 0, plan


def test_random_project_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        random_project(df, out_dim=4)
