"""Deterministic random walks (graph.random_walks) vs a pure-python
replay of the md5-uniform neighbor pick — the cross-engine determinism
is the operator's contract (regenerating a shard must yield the
identical corpus)."""

import hashlib

import pytest

from gliner_spark.operators.graph import random_walks

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4)]
# vertex 4 is dangling — walks entering it terminate


def _py_walks(edges, walk_len, walks_per_vertex, seed):
    adj = {}
    for s, d in sorted(set((s, d) for s, d in edges if s != d)):
        adj.setdefault(s, []).append(d)
    verts = sorted({v for e in edges for v in e})
    rows = []
    for start in verts:
        for rep in range(walks_per_vertex):
            cur = start
            rows.append((start, rep, 0, cur))
            for t in range(walk_len):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = hashlib.md5(
                    f"{seed}|{start}|{rep}|{t}|{cur}".encode()
                ).hexdigest()
                cur = nbrs[int(h[:8], 16) % len(nbrs)]
                rows.append((start, rep, t + 1, cur))
    return sorted(rows)


def _got(df):
    return sorted(
        (r.start_id, r.rep, r.step, r.vertex) for r in df.collect()
    )


@pytest.mark.parametrize("seed", [7, 42])
def test_random_walks_match_python_replay(spark, seed):
    df = spark.createDataFrame(EDGES, "subj_id long, obj_id long")
    got = _got(random_walks(df, walk_len=6, seed=seed))
    assert got == _py_walks(EDGES, 6, 1, seed)


def test_random_walks_multiple_reps(spark):
    df = spark.createDataFrame(EDGES, "subj_id long, obj_id long")
    got = _got(random_walks(df, walk_len=4, walks_per_vertex=3, seed=7))
    assert got == _py_walks(EDGES, 4, 3, 7)
    # reps explore differently somewhere (vertex 0 has 2 neighbors)
    by_rep = {
        rep: [v for s, r2, _t, v in got if s == 0 and r2 == rep]
        for rep in range(3)
    }
    assert len({tuple(v) for v in by_rep.values()}) > 1


def test_random_walks_regeneration_is_identical(spark):
    df = spark.createDataFrame(EDGES, "subj_id long, obj_id long")
    a = _got(random_walks(df, walk_len=5, seed=7))
    b = _got(random_walks(df, walk_len=5, seed=7))
    assert a == b
    c = _got(random_walks(df, walk_len=5, seed=8))
    assert a != c


def test_random_walks_terminate_at_dangling(spark):
    df = spark.createDataFrame(EDGES, "subj_id long, obj_id long")
    got = _got(random_walks(df, walk_len=10, seed=7))
    # any row at vertex 4 is the last step of its walk
    for start, rep, step, vertex in got:
        if vertex == 4:
            assert not any(
                s == start and r == rep and t == step + 1
                for s, r, t, _v in got
            )
    # dangling start vertex emits exactly its step-0 row
    assert [(s, r, t, v) for s, r, t, v in got if s == 4] == [(4, 0, 0, 4)]


def test_random_walks_step_joins_are_equi_joins(spark):
    df = spark.createDataFrame(EDGES, "subj_id long, obj_id long")
    out = random_walks(df, walk_len=3, seed=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
