"""Distributed PCA vs numpy: component/eigenvalue parity, variance
ordering, projection correctness, and the pure-map projection plan."""

import numpy as np
import pytest
from pyspark.sql import Row

from gliner_spark.operators.similarity import pca_components, pca_project

RNG = np.random.default_rng(11)
# anisotropic cloud: variance concentrated along two planted axes
_BASE = RNG.normal(size=(80, 12)) * 0.1
_BASE[:, 2] += RNG.normal(size=80) * 3.0
_BASE[:, 7] += RNG.normal(size=80) * 1.5
_BASE += RNG.normal(size=12)  # offset: centering must matter
VECS = [(i, [float(x) for x in _BASE[i]]) for i in range(80)]


def _df(spark, parts=5):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in VECS]
    ).repartition(parts)


def _np_pca(x, k):
    mu = x.mean(axis=0)
    c = x - mu
    cov = c.T @ c / len(x)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for ci in comps:
        j = int(np.argmax(np.abs(ci)))
        if ci[j] < 0:
            ci *= -1
    return comps, mu, vals[order]


def test_pca_matches_numpy(spark):
    comps, mean, ev = pca_components(_df(spark), out_dim=3)
    ncomps, nmu, nev = _np_pca(_BASE, 3)
    assert np.allclose(mean, nmu, atol=1e-9)
    assert np.allclose(ev, nev, atol=1e-9)
    assert np.allclose(np.asarray(comps), ncomps, atol=1e-8)
    # variance ordering + the planted heavy axes dominate component 0/1
    assert ev[0] >= ev[1] >= ev[2]
    assert abs(comps[0][2]) > 0.9 and abs(comps[1][7]) > 0.9


def test_pca_project_matches_numpy_and_is_pure_map(spark):
    comps, mean, _ = pca_components(_df(spark), out_dim=4)
    out = pca_project(_df(spark), comps, mean)
    got = {r.vec_id: np.asarray(r.proj) for r in out.collect()}
    w = np.asarray(comps)
    mu = np.asarray(mean)
    for i, v in VECS:
        want = w @ (np.asarray(v) - mu)
        assert np.allclose(got[i], want, atol=1e-9), i
    # plan check on an UNrepartitioned input (repartition is itself an
    # Exchange the operator is not responsible for)
    flat = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in VECS]
    )
    plan = (
        pca_project(flat, comps, mean)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 0, plan


def test_pca_partition_order_independent(spark):
    a = pca_components(_df(spark, parts=2), out_dim=2)
    b = pca_components(_df(spark, parts=9), out_dim=2)
    assert np.allclose(a[0], b[0], atol=1e-9)
    assert np.allclose(a[1], b[1], atol=1e-9)


def test_pca_validates_inputs(spark):
    empty = _df(spark).where("vec_id < 0")
    with pytest.raises(ValueError):
        pca_components(empty, out_dim=2)
    with pytest.raises(ValueError):
        pca_components(_df(spark), out_dim=0)
    with pytest.raises(ValueError):
        pca_components(_df(spark), out_dim=99)
