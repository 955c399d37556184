"""Brandes betweenness from sampled sources (operators/graph.py).

The forward sigma pass is checked against a python BFS path-count; the
full dependency accumulation against a hop-bounded python Brandes.
"""
import pytest

from gliner_spark.operators.graph import (
    betweenness_centrality,
    shortest_path_counts,
)


def _py_forward(pairs, s, max_hops):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
    dist, sigma = {s: 0}, {s: 1}
    frontier = [s]
    for d in range(1, max_hops + 1):
        counts = {}
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    counts[v] = counts.get(v, 0) + sigma[u]
        for v, c in counts.items():
            dist[v], sigma[v] = d, c
        frontier = list(counts)
    return dist, sigma, adj


def _py_brandes(pairs, sources, max_hops):
    bc = {}
    for s in sources:
        dist, sigma, adj = _py_forward(pairs, s, max_hops)
        order = sorted(dist, key=dist.get, reverse=True)
        delta = {v: 0.0 for v in dist}
        for w in order:
            for u in (x for x in dist if w in adj.get(x, ())):
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v in dist:
            if v != s:
                bc[v] = bc.get(v, 0.0) + delta[v]
    return bc


PAIRS = [(i % 23, (i * 7 + 3) % 19) for i in range(80)]


def test_sigma_matches_python_bfs(spark):
    e = spark.createDataFrame(PAIRS, "src long, dst long")
    got = {
        (r["source"], r["id"]): (r["hop"], r["sigma"])
        for r in shortest_path_counts(e, [0, 1, 2], max_hops=4).collect()
    }
    for s in (0, 1, 2):
        dist, sigma, _ = _py_forward(PAIRS, s, 4)
        want = {(s, v): (dist[v], sigma[v]) for v in dist}
        assert {k: v for k, v in got.items() if k[0] == s} == want


def test_betweenness_matches_python_brandes(spark):
    e = spark.createDataFrame(PAIRS, "src long, dst long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(e, [0, 1, 2], max_hops=4).collect()
    }
    want = _py_brandes(PAIRS, [0, 1, 2], 4)
    # spark emits only vertices reached at hop>=1; python dict agrees
    want = {v: x for v, x in want.items()}
    assert set(got) == set(want)
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-9), v


def test_diamond_graph_hand_values(spark):
    # s -> a, s -> b, a -> t, b -> t: sigma(t)=2, delta(a)=delta(b)=1/2
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(e, [0], max_hops=3).collect()
    }
    assert got == {1: 0.5, 2: 0.5, 3: 0.0}


def test_max_hops_truncates(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    spc = shortest_path_counts(e, [0], max_hops=2)
    assert spc.where("id = 3").count() == 0


def test_disconnected_source_all_zero(spark):
    e = spark.createDataFrame([(5, 6)], "src long, dst long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(e, [99], max_hops=3).collect()
    }
    assert all(v == 0.0 for v in got.values())


def test_cycle_graph_symmetry(spark):
    # directed 5-cycle, source 0: every interior vertex relays the
    # paths beyond it; python parity already pinned, here pin symmetry
    n = 5
    pairs = [(i, (i + 1) % n) for i in range(n)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(e, [0], max_hops=n - 1).collect()
    }
    want = _py_brandes(pairs, [0], n - 1)
    assert got == {v: pytest.approx(x) for v, x in want.items()}
    # strictly decreasing dependency moving away from the source
    assert got[1] > got[2] > got[3] > got[4] == 0.0
