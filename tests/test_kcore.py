"""k-core decomposition: Spark peel vs the sequential
Batagelj-Zaversnik oracle on a deterministic random graph with a
planted clique; k_core(k) must equal the subgraph induced by
core >= k."""

import random

import pytest

from gliner_spark.operators.graph import core_numbers, k_core


def _core_numbers_py(edges):
    """Batagelj & Zaversnik (2003) min-degree peel via a lazy heap."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed, core, k = set(), {}, 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue  # stale heap entry
        k = max(k, deg[v])
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def _test_graph():
    """Sparse random graph + a planted 6-clique (core 5) + a pendant
    chain (core 1), with directed duplicates and a self-loop thrown in
    to exercise canonicalization."""
    rng = random.Random(41)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(90)
    ]
    clique = [100, 101, 102, 103, 104, 105]
    edges += [
        (a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]
    ]
    edges += [(105, 200), (200, 201), (201, 202)]  # pendant chain
    edges += [(7, 7), (101, 100)]  # self-loop + reversed duplicate
    return edges


@pytest.fixture(scope="module")
def graph_df(spark):
    return spark.createDataFrame(_test_graph(), "src long, dst long")


def test_core_numbers_match_sequential_oracle(spark, graph_df):
    got = {
        r.v: r.core for r in core_numbers(graph_df).collect()
    }
    want = _core_numbers_py(_test_graph())
    assert got == want
    assert all(want[v] == 5 for v in (100, 101, 102, 103, 104, 105))
    assert want[202] == 1


def test_core_numbers_distributed_equals_local(spark, graph_df):
    """small_solve=0 forces the distributed peel; it must agree with
    the driver-local Batagelj-Zaversnik finisher exactly."""
    local = {
        r.v: r.core for r in core_numbers(graph_df).collect()
    }
    dist = {
        r.v: r.core
        for r in core_numbers(graph_df, small_solve=0).collect()
    }
    assert dist == local


def test_k_core_distributed_equals_local(spark, graph_df):
    for k in (2, 5):
        local = {
            (r.a, r.b) for r in k_core(graph_df, k).collect()
        }
        dist = {
            (r.a, r.b)
            for r in k_core(graph_df, k, small_solve=0).collect()
        }
        assert dist == local, k


def test_k_core_is_induced_subgraph_of_core_geq_k(spark, graph_df):
    want = _core_numbers_py(_test_graph())
    for k in (1, 2, 3, 5):
        sub = k_core(graph_df, k).collect()
        verts = {r.a for r in sub} | {r.b for r in sub}
        assert verts == {v for v, c in want.items() if c >= k}, k
        # every surviving vertex keeps degree >= k inside the core
        deg = {}
        for r in sub:
            deg[r.a] = deg.get(r.a, 0) + 1
            deg[r.b] = deg.get(r.b, 0) + 1
        assert all(d >= k for d in deg.values()), k


def test_k_core_above_max_core_is_empty(spark, graph_df):
    assert k_core(graph_df, 6).count() == 0


def test_core_numbers_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert core_numbers(e).count() == 0


def test_k_core_rejects_nonpositive_k(spark, graph_df):
    with pytest.raises(ValueError):
        k_core(graph_df, 0)
