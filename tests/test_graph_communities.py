"""LPA communities, HITS, and warm-start PageRank vs python oracles.

The Spark operators (operators/graph.py) are replayed exactly:
label_propagation against a pure-python synchronous LPA with the same
min-label tie-break, hits against a numpy power iteration with the same
deferred-normalization arithmetic, and pagerank's init_ranks warm start
against its own cold fixpoint.
"""

import numpy as np
import pytest
from pyspark.sql import Row

from gliner_spark.operators.graph import (
    hits,
    label_propagation,
    pagerank,
)


def py_lpa(edge_list, rounds):
    und = set()
    for s, d in edge_list:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    verts = sorted({v for e in und for v in e})
    adj = {v: [] for v in verts}
    for s, d in und:
        adj[s].append(d)
    lab = {v: v for v in verts}
    for _ in range(rounds):
        new = {}
        for v in verts:
            cnt = {}
            for nb in adj[v]:
                cnt[lab[nb]] = cnt.get(lab[nb], 0) + 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def numpy_hits(n, edge_list, iters):
    A = np.zeros((n, n))
    for s, d in edge_list:
        if s != d:
            A[s, d] = 1.0
    h = np.ones(n)
    araw = hraw = None
    for _ in range(iters):
        araw = A.T @ h
        hraw = A @ araw
        h = hraw / hraw.sum()
    return hraw / hraw.sum(), araw / araw.sum()


# two cliques joined by one bridge, a chain, and a pseudo-random graph
CLIQUES = [
    (a, b) for c in (range(0, 5), range(10, 15)) for a in c for b in c
    if a < b
] + [(4, 10)]
CHAIN = [(i, i + 1) for i in range(8)]
PSEUDO = sorted({((i * 7) % 23, (i * 13 + 5) % 23) for i in range(60)})


@pytest.mark.parametrize("edges", [CLIQUES, CHAIN, PSEUDO])
@pytest.mark.parametrize("rounds", [1, 3])
def test_lpa_matches_python(spark, edges, rounds):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {
        r.id: r.label
        for r in label_propagation(df, max_iter=rounds).collect()
    }
    assert got == py_lpa(edges, rounds)


def test_lpa_two_cliques_settle_on_their_min_labels(spark):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in CLIQUES])
    got = {
        r.id: r.label for r in label_propagation(df, max_iter=4).collect()
    }
    assert {got[v] for v in range(0, 5)} == {0}
    assert {got[v] for v in range(10, 15)} == {10}


def test_lpa_drops_self_loops_and_empty_graph(spark):
    df = spark.createDataFrame(
        [Row(src=1, dst=1), Row(src=2, dst=3)]
    )
    got = {
        r.id: r.label for r in label_propagation(df, max_iter=1).collect()
    }
    # vertex 1 has only a self-loop -> not in the graph at all; the
    # 2-3 pair swaps labels every round (the classic LPA oscillation
    # the pinned round count makes reproducible)
    assert got == {2: 3, 3: 2}
    empty = df.where("src = 99")
    assert label_propagation(empty, max_iter=2).count() == 0


HITS_CASES = [
    # bipartite: hubs on the left, authorities on the right
    [(0, 3), (0, 4), (1, 3), (2, 4), (1, 5)],
    # cycle + chord
    [(0, 1), (1, 2), (2, 0), (0, 2)],
    PSEUDO,
]


@pytest.mark.parametrize("edges", HITS_CASES)
def test_hits_matches_numpy(spark, edges):
    n = max(max(e) for e in edges) + 1
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    rows = hits(df, max_iter=4).collect()
    hub, auth = numpy_hits(n, edges, 4)
    present = {v for e in edges for v in e if e[0] != e[1]}
    assert {r.entity_id for r in rows} == present
    for r in rows:
        assert r.hub == pytest.approx(hub[r.entity_id], abs=1e-9)
        assert r.auth == pytest.approx(auth[r.entity_id], abs=1e-9)


def test_hits_l1_normalized_and_zero_sides(spark):
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in HITS_CASES[0]]
    )
    rows = hits(df, max_iter=3).collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.auth for r in rows) == pytest.approx(1.0, abs=1e-9)
    by_id = {r.entity_id: r for r in rows}
    # pure sources have auth exactly 0; pure sinks hub exactly 0
    assert by_id[0].auth == 0.0 and by_id[3].hub == 0.0


# irregular degrees on purpose: a regular graph (e.g. a permutation)
# has exactly uniform PageRank, which would make warm == cold trivially
PR_BASE = sorted({((i * i + i) % 13, (i * 7 + 2) % 17) for i in range(40)})
PR_DELTA = [(0, 16), (16, 2)]


def numpy_weighted_pagerank(n, wedges, damping=0.85, iters=60):
    out_w = np.zeros(n)
    for s, _d, w in wedges:
        out_w[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d, w in wedges:
            inflow[d] += r[s] * w / out_w[s]
        dangling = r[out_w == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return r


def test_weighted_pagerank_matches_numpy(spark):
    # multigraph on purpose: (0,1) appears twice -> weights sum
    raw = [(0, 1, 2.0), (0, 1, 1.0), (0, 2, 1.0), (1, 2, 5.0),
           (2, 0, 1.0), (2, 3, 3.0), (3, 3, 9.0), (1, 0, 0.0)]
    df = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d, w=w) for s, d, w in raw]
    )
    got = {
        r.entity_id: r.rank
        for r in pagerank(
            df, max_iter=60, tol=1e-12, weight_col="w"
        ).collect()
    }
    # the oracle sees the folded simple graph: self-loops and
    # non-positive weights dropped, parallel edges summed
    folded = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 5.0), (2, 0, 1.0),
              (2, 3, 3.0)]
    exp = numpy_weighted_pagerank(4, folded)
    for i in range(4):
        assert got[i] == pytest.approx(exp[i], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the 5x edge 1->2 should pull 2 above the lightly-fed 3
    assert got[2] > got[3]


def test_weighted_all_ones_equals_unweighted_on_simple_graph(spark):
    df = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d, w=1.0) for s, d in PR_BASE]
    )
    got_w = {
        r.entity_id: r.rank
        for r in pagerank(df, max_iter=40, tol=0.0, weight_col="w").collect()
    }
    got_u = {
        r.entity_id: r.rank
        for r in pagerank(df, max_iter=40, tol=0.0).collect()
    }
    for k, v in got_u.items():
        assert got_w[k] == pytest.approx(v, abs=1e-12)


def _rank_map(df):
    return {r.entity_id: r.rank for r in df.collect()}


def test_pagerank_warm_start_is_a_fixpoint_noop(spark):
    df = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d) for s, d in PR_BASE]
    )
    cold = pagerank(df, max_iter=80, tol=1e-13)
    warm = _rank_map(pagerank(df, max_iter=3, tol=1e-10, init_ranks=cold))
    for k, v in _rank_map(cold).items():
        assert warm[k] == pytest.approx(v, abs=1e-9)


def test_pagerank_warm_start_after_edge_append(spark):
    full = PR_BASE + PR_DELTA
    df_base = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d) for s, d in PR_BASE]
    )
    df_full = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d) for s, d in full]
    )
    prev = pagerank(df_base, max_iter=80, tol=1e-13)
    fix = _rank_map(pagerank(df_full, max_iter=100, tol=1e-13))

    # converged warm == converged cold (same fixpoint)
    warm = _rank_map(
        pagerank(df_full, max_iter=100, tol=1e-13, init_ranks=prev)
    )
    for k, v in fix.items():
        assert warm[k] == pytest.approx(v, abs=1e-8)

    # and at a PINNED 3 iterations the error obeys the power-iteration
    # L1 contraction ||x_k - fix||_1 <= d^k * ||x_0 - fix||_1 (the
    # Google matrix contracts at the damping factor) — warm-start's
    # payoff is exactly that x_0 starts ||prev - fix|| away, not
    # ||uniform - fix|| away. "Warm is always closer than cold" is NOT
    # a theorem (a delta can move the fixpoint toward uniform), so the
    # contraction bound is what gets pinned, for both inits.
    n = len(fix)
    prev_map = _rank_map(prev)  # same vertex set, already sums to 1
    for init, got3 in (
        (prev_map, _rank_map(
            pagerank(df_full, max_iter=3, tol=0.0, init_ranks=prev))),
        ({k: 1.0 / n for k in fix},
         _rank_map(pagerank(df_full, max_iter=3, tol=0.0))),
    ):
        err3 = sum(abs(got3[k] - fix[k]) for k in fix)
        err0 = sum(abs(init[k] - fix[k]) for k in fix)
        assert err3 <= 0.85 ** 3 * err0 + 1e-9
