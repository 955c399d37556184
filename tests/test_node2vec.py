"""node2vec biased walks vs an exact python replay: the md5-uniform
weighted pick adds the same operands in the same dst-ordered sequence
on both engines, so parity is bit-exact, not statistical."""

import hashlib

import pytest
from pyspark.sql import Row

from gliner_spark.operators.graph import node2vec_walks


def _u(seed, start, rep, step, cur):
    h = hashlib.md5(
        f"{seed}|n2v|{start}|{rep}|{step}|{cur}".encode()
    ).hexdigest()
    return int(h[:8], 16) / 2**32


def py_node2vec(edge_list, walk_len, p, q, reps, seed):
    e = sorted({(s, d) for s, d in edge_list if s != d})
    eset = set(e)
    adj = {}
    verts = set()
    for s, d in e:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    rows = []
    for start in sorted(verts):
        for rep in range(reps):
            prev, cur = None, start
            rows.append((start, rep, 0, cur))
            for t in range(walk_len):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                cum = 0.0
                cums = []
                for w in nbrs:
                    if w == prev:
                        a = 1.0 / p
                    elif prev is not None and (prev, w) in eset:
                        a = 1.0
                    else:
                        a = 1.0 / q
                    cum += a
                    cums.append((w, a, cum))
                target = _u(seed, start, rep, t, cur) * cum
                for w, a, c in cums:
                    if c > target and c - a <= target:
                        prev, cur = cur, w
                        rows.append((start, rep, t + 1, cur))
                        break
    return sorted(rows)


PSEUDO = sorted({((i * 7) % 19, (i * 11 + 5) % 19) for i in range(70)})


@pytest.mark.parametrize("p,q", [(2.0, 0.5), (0.25, 4.0), (1.0, 1.0)])
def test_node2vec_matches_python_exactly(spark, p, q):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in PSEUDO])
    got = sorted(
        (r.start_id, r.rep, r.step, r.vertex)
        for r in node2vec_walks(
            df, walk_len=4, p=p, q=q, walks_per_vertex=2, seed=11,
            src_col="src", dst_col="dst",
        ).collect()
    )
    assert got == py_node2vec(PSEUDO, 4, p, q, 2, 11)


def test_node2vec_nonbinary_pq_still_exact(spark):
    # 1/p, 1/q not representable exactly — parity must still hold
    # because both engines add the SAME doubles in the SAME order
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in PSEUDO])
    got = sorted(
        (r.start_id, r.rep, r.step, r.vertex)
        for r in node2vec_walks(
            df, walk_len=3, p=3.0, q=0.7, walks_per_vertex=1, seed=5,
            src_col="src", dst_col="dst",
        ).collect()
    )
    assert got == py_node2vec(PSEUDO, 3, 3.0, 0.7, 1, 5)


def test_node2vec_huge_q_forces_triangle_edge(spark):
    # whenever a walk from 0 stepped to 1 first (uniform first step —
    # 0's neighbors are {1, 2} since the triangle edge 0->2 must
    # exist), the next step from prev=0, cur=1 MUST take 2: it is the
    # only prev-adjacent candidate (weight 1) and p, q huge crush the
    # return and outward weights
    edges = [(0, 1), (1, 2), (1, 3), (1, 4), (0, 2)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    forced = 0
    for seed in (7, 8, 9, 10, 11):  # 8 and 9 draw u < 0.5 at step 0
        rows = {
            (r.start_id, r.step): r.vertex
            for r in node2vec_walks(
                df, walk_len=2, p=1e9, q=1e9, seed=seed,
                src_col="src", dst_col="dst",
            ).collect()
        }
        if rows[(0, 1)] == 1:
            forced += 1
            assert rows[(0, 2)] == 2, (seed, rows)
    assert forced >= 1  # the uniform first step hit 1 at least once


def test_node2vec_termination_and_determinism(spark):
    edges = [(0, 1), (1, 2)]  # 2 is dangling
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    a = node2vec_walks(df, walk_len=9, p=2.0, q=2.0, seed=3,
                       src_col="src", dst_col="dst")
    rows = sorted(
        (r.start_id, r.rep, r.step, r.vertex) for r in a.collect()
    )
    # walk from 0: 0,1,2 then dies; from 1: 1,2; from 2: just itself
    assert rows == [(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 2),
                    (1, 0, 0, 1), (1, 0, 1, 2), (2, 0, 0, 2)]
    b = node2vec_walks(df, walk_len=9, p=2.0, q=2.0, seed=3,
                       src_col="src", dst_col="dst")
    assert rows == sorted(
        (r.start_id, r.rep, r.step, r.vertex) for r in b.collect()
    )


def test_node2vec_rejects_bad_params(spark):
    df = spark.createDataFrame([Row(src=0, dst=1)])
    with pytest.raises(ValueError):
        node2vec_walks(df, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(df, q=-1.0)


def test_skipgram_pairs_match_python(spark):
    from gliner_spark.operators.graph import (
        random_walks,
        skipgram_pairs,
    )

    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in PSEUDO])
    walks = random_walks(
        df, walk_len=4, walks_per_vertex=2, seed=9,
        src_col="src", dst_col="dst",
    )
    rows = [(r.start_id, r.rep, r.step, r.vertex) for r in walks.collect()]
    seqs = {}
    for start, rep, step, v in sorted(rows):
        seqs.setdefault((start, rep), []).append((step, v))
    want = {}
    for seq in seqs.values():
        vs = [v for _s, v in sorted(seq)]
        for i, c in enumerate(vs):
            for j in range(max(0, i - 2), min(len(vs), i + 3)):
                if j != i:
                    key = (c, vs[j])
                    want[key] = want.get(key, 0) + 1
    got = {
        (r.center, r.context): r.n
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got == want
    # symmetric corpus: (a, b) and (b, a) counts match
    assert all(got[(a, b)] == got[(b, a)] for a, b in got)


def test_skipgram_rejects_bad_window(spark):
    from gliner_spark.operators.graph import skipgram_pairs

    df = spark.createDataFrame(
        [Row(start_id=0, rep=0, step=0, vertex=0)]
    )
    with pytest.raises(ValueError):
        skipgram_pairs(df, window=0)
