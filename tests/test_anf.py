"""ANF neighborhood function + effective diameter (operators/graph.py).

Exact mode is pinned on hand-computed graphs; sketch mode (the scale
path) is checked against exact mode within FM error bounds and for
bit-determinism across runs.
"""
import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.graph import (
    effective_diameter,
    neighborhood_function,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_exact_path_graph(spark):
    # 1 -> 2 -> 3 -> 4
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    nf = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(e, max_t=5, method="exact").collect()
    }
    assert nf == {0: 4.0, 1: 7.0, 2: 9.0, 3: 10.0, 4: 10.0, 5: 10.0}


def test_exact_undirected_and_self_loops_dropped(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 1)])
    nf = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(
            e, max_t=3, method="exact", directed=False
        ).collect()
    }
    # chain 1-2-3 undirected: NF(0)=3, NF(1)=3+4=7, NF(2)=9 (all pairs)
    assert nf == {0: 3.0, 1: 7.0, 2: 9.0, 3: 9.0}


def test_exact_row_count_fixed_grid(spark):
    e = _edges(spark, [(1, 2)])
    rows = neighborhood_function(e, max_t=6, method="exact").collect()
    assert len(rows) == 7
    assert sorted(r["t"] for r in rows) == list(range(7))


@pytest.mark.parametrize(
    "pairs",
    [
        # functional graph (out-degree 1): every ball is tiny -> pins
        # the linear-counting small-range correction
        [(i % 97, (i * 7 + 3) % 97) for i in range(400)],
        # expander (mixed moduli): balls saturate ~full graph by t=4
        [(i % 97, (i * 7 + 3) % 89) for i in range(400)],
    ],
    ids=["deg1-chain", "expander"],
)
def test_sketch_tracks_exact_within_fm_error(spark, pairs):
    e = _edges(spark, pairs)
    exact = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(e, max_t=6, method="exact").collect()
    }
    est = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(
            e, max_t=6, method="sketch", n_sketches=64
        ).collect()
    }
    assert set(est) == set(exact)
    for t, v in exact.items():
        assert est[t] == pytest.approx(v, rel=0.15), (t, est[t], v)
    # monotone non-decreasing estimates
    seq = [est[t] for t in sorted(est)]
    assert all(b >= a for a, b in zip(seq, seq[1:]))


def test_sketch_deterministic(spark):
    e = _edges(spark, [(i % 31, (i * 5 + 1) % 31) for i in range(80)])
    a = neighborhood_function(e, max_t=4, n_sketches=16).collect()
    b = neighborhood_function(e, max_t=4, n_sketches=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_effective_diameter_interpolation(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    nf = neighborhood_function(e, max_t=4, method="exact")
    # NF = [4,7,9,10,10]; q=0.9 -> target 9.0 -> exactly t=2
    assert effective_diameter(nf, q=0.9) == 2.0
    # q=0.5 -> target 5.0, between t=0 (4) and t=1 (7): 0 + 1/3
    assert effective_diameter(nf, q=0.5) == pytest.approx(1 / 3)


def test_bad_method_raises(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        neighborhood_function(e, method="hyperball")
