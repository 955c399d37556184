"""Multi-source BFS shortest paths vs a pure-Python BFS oracle."""

from collections import defaultdict, deque

import pytest

from gliner_spark.operators.graph import bfs_distances


def python_bfs(edges, landmarks, max_hops):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    out = {}
    for lm in landmarks:
        dist = {lm: 0}
        q = deque([lm])
        while q:
            v = q.popleft()
            if dist[v] == max_hops:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, h in dist.items():
            out[(lm, v)] = h
    return out


def _run(spark, edges, landmarks, max_hops):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = bfs_distances(df, landmarks, max_hops=max_hops).collect()
    assert len(got) == len({(r.landmark, r.id) for r in got})
    return {(r.landmark, r.id): r.hop for r in got}


def test_bfs_matches_python_on_pseudo_random_graph(spark):
    edges = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)]
    landmarks = [0, 5, 17]
    for max_hops in (1, 3, 30):
        assert _run(spark, edges, landmarks, max_hops) == python_bfs(
            edges, landmarks, max_hops
        )


def test_bfs_chain_truncates_at_max_hops(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert _run(spark, edges, [0], 2) == {(0, 0): 0, (0, 1): 1, (0, 2): 2}


def test_bfs_first_reach_is_shortest(spark):
    # two routes 0→3: direct edge (1 hop) and via 1→2 (3 hops)
    edges = [(0, 3), (0, 1), (1, 2), (2, 3)]
    assert _run(spark, edges, [0], 4) == {
        (0, 0): 0,
        (0, 1): 1,
        (0, 2): 2,
        (0, 3): 1,
    }


def test_bfs_isolated_landmark_and_cycle(spark):
    edges = [(0, 1), (1, 0)]
    # 99 has no edges at all — still reported at hop 0
    assert _run(spark, edges, [0, 99], 5) == {
        (0, 0): 0,
        (0, 1): 1,
        (99, 99): 0,
    }


def test_bfs_landmarks_as_dataframe(spark):
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    lm = spark.createDataFrame([(0,), (0,)], "id long")  # dup collapses
    got = {
        (r.landmark, r.id): r.hop
        for r in bfs_distances(df, lm, max_hops=2).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2}
