"""Spectral embeddings (operators/embeddings.py): PPMI python replay,
randomized-SVD parity vs numpy, Levy-Goldberg reconstruction, e2e
graph → walks → pairs → vectors."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.embeddings import ppmi, svd_embed


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "center long, context long, n long"
    )


def test_ppmi_matches_python(spark):
    rows = [(0, 1, 4), (0, 2, 1), (1, 0, 4), (2, 0, 1), (1, 2, 3)]
    got = {
        (r["i"], r["j"]): r["w"]
        for r in ppmi(_pairs(spark, rows), shift=1.0).collect()
    }
    N = sum(n for _, _, n in rows)
    ni = {}
    nj = {}
    for i, j, n in rows:
        ni[i] = ni.get(i, 0) + n
        nj[j] = nj.get(j, 0) + n
    for i, j, n in rows:
        v = math.log(n * N / (ni[i] * nj[j]))
        if v > 0:
            assert abs(got[(i, j)] - v) < 1e-12
        else:
            assert (i, j) not in got
    assert ppmi(_pairs(spark, rows), shift=8.0).count() <= len(got)


def _to_dense(entries, n, m):
    M = np.zeros((n, m))
    for i, j, w in entries:
        M[i, j] = w
    return M


def _collect_emb(df, n, k):
    out = np.zeros((n, k))
    for r in df.collect():
        out[r["id"]] = np.array(r["vec"])
    return out


def test_svd_exact_rank_recovery(spark):
    rng = np.random.RandomState(3)
    A = rng.rand(12, 3)
    B = rng.rand(3, 10)
    M = A @ B  # exact rank 3
    entries = [
        (i, j, float(M[i, j])) for i in range(12) for j in range(10)
    ]
    df = spark.createDataFrame(entries, "i long, j long, w double")
    word, ctx, sig = svd_embed(df, k=3, iters=6, seed=5)
    s_np = np.linalg.svd(M, compute_uv=False)[:3]
    assert np.allclose(sorted(sig, reverse=True), s_np, rtol=1e-8)
    E = _collect_emb(word, 12, 3)
    C = _collect_emb(ctx, 10, 3)
    assert np.max(np.abs(E @ C.T - M)) < 1e-8


def test_svd_truncation_close_to_numpy_optimum(spark):
    rng = np.random.RandomState(11)
    M = rng.rand(30, 25)
    entries = [
        (i, j, float(M[i, j])) for i in range(30) for j in range(25)
    ]
    df = spark.createDataFrame(entries, "i long, j long, w double")
    word, ctx, sig = svd_embed(df, k=5, iters=8, seed=2)
    E = _collect_emb(word, 30, 5)
    C = _collect_emb(ctx, 25, 5)
    err = np.linalg.norm(E @ C.T - M)
    s = np.linalg.svd(M, compute_uv=False)
    opt = np.linalg.norm(np.diag(s[5:]))  # Eckart-Young optimum
    assert err <= opt * 1.05


def test_svd_deterministic(spark):
    entries = [
        ((i * 7) % 9, (i * 13) % 8, float(1 + i % 5)) for i in range(60)
    ]
    df = spark.createDataFrame(entries, "i long, j long, w double")
    w1, _, s1 = svd_embed(df, k=4, iters=4, seed=9)
    w2, _, s2 = svd_embed(df, k=4, iters=4, seed=9)
    # reproducible up to float-aggregation combine order (the Gram
    # sums are hash-agg reductions, so last-bit wobble is expected)
    assert np.allclose(s1, s2, rtol=1e-9)
    r1 = {r["id"]: np.array(r["vec"]) for r in w1.collect()}
    r2 = {r["id"]: np.array(r["vec"]) for r in w2.collect()}
    assert set(r1) == set(r2)
    for i in r1:
        assert np.allclose(r1[i], r2[i], rtol=1e-6, atol=1e-9)


def test_e2e_walk_embeddings_separate_cliques(spark):
    from gliner_spark.operators.graph import random_walks, skipgram_pairs

    # two disjoint 5-cliques (directed both ways)
    edges = []
    for base in (0, 100):
        for a in range(5):
            for b in range(5):
                if a != b:
                    edges.append((base + a, base + b))
    g = spark.createDataFrame(edges, "src long, dst long")
    walks = random_walks(
        g, walk_len=6, walks_per_vertex=4, seed=3,
        src_col="src", dst_col="dst",
    )
    pairs = skipgram_pairs(walks, window=2)
    mat = ppmi(pairs)
    word, _, _ = svd_embed(mat, k=4, iters=4, seed=1)
    vecs = {r["id"]: np.array(r["vec"]) for r in word.collect()}

    def cos(a, b):
        return float(
            vecs[a] @ vecs[b]
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )

    within = [cos(0, i) for i in range(1, 5)]
    across = [cos(0, 100 + i) for i in range(5)]
    assert min(within) > max(across)


def test_svd_warm_start_beats_cold_at_one_iteration(spark):
    rng = np.random.RandomState(17)
    A = rng.rand(25, 4)
    B = rng.rand(4, 20)
    M0 = A @ B + 0.01 * rng.rand(25, 20)

    def df_of(M):
        return spark.createDataFrame(
            [
                (i, j, float(M[i, j]))
                for i in range(M.shape[0])
                for j in range(M.shape[1])
            ],
            "i long, j long, w double",
        )

    _, ctx0, _ = svd_embed(df_of(M0), k=4, iters=6, seed=3)
    # small append: perturb a few cells (the subspace barely moves)
    M1 = M0.copy()
    M1[:3, :3] += 0.05
    ref_w, ref_c, _ = svd_embed(df_of(M1), k=4, iters=8, seed=3)
    warm_w, warm_c, _ = svd_embed(df_of(M1), k=4, iters=1, seed=3, init=ctx0)
    cold_w, cold_c, _ = svd_embed(df_of(M1), k=4, iters=1, seed=4)

    def recon_err(w, c):
        E = _collect_emb(w, 25, 4)
        C = _collect_emb(c, 20, 4)
        return np.linalg.norm(E @ C.T - M1)

    e_ref = recon_err(ref_w, ref_c)
    e_warm = recon_err(warm_w, warm_c)
    e_cold = recon_err(cold_w, cold_c)
    assert e_warm <= e_cold + 1e-12
    assert e_warm <= e_ref * 1.001  # warm 1-iter ≈ converged


def test_svd_warm_start_handles_new_and_stale_ids(spark):
    entries = [(i, j, float(1 + (i * j) % 7)) for i in range(10)
               for j in range(8)]
    df = spark.createDataFrame(entries, "i long, j long, w double")
    _, ctx, _ = svd_embed(df, k=3, iters=4, seed=1)
    # grow the column space (new j=8,9) and drop j=0 from the matrix
    entries2 = [
        (i, j, float(1 + (i * j) % 7))
        for i in range(10)
        for j in range(1, 10)
    ]
    df2 = spark.createDataFrame(entries2, "i long, j long, w double")
    w2, c2, s2 = svd_embed(df2, k=3, iters=3, seed=1, init=ctx)
    ids = sorted(r["id"] for r in c2.collect())
    assert ids == list(range(1, 10))
    assert all(s >= 0 for s in s2)


# ------------------------------------------------------------ link_auc


def _auc_py(edges, vecs, neg_per_pos, seed, n_verts, iverts):
    import hashlib

    e = {(s, d) for s, d in edges if s != d}
    cand = []
    for s, d in sorted(e):
        for rep in range(neg_per_pos):
            h = hashlib.md5(f"{seed}|{s}|{d}|{rep}".encode()).hexdigest()
            t = iverts[int(h[:8], 16) % n_verts]
            if t != s and (s, t) not in e:
                cand.append((s, t))
    scores = []
    for s, d in sorted(e):
        scores.append((float(vecs[s] @ vecs[d]), 1))
    for s, d in cand:
        scores.append((float(vecs[s] @ vecs[d]), 0))
    scores.sort()
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and scores[j][0] == scores[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = avg
        i = j
    P = sum(y for _s, y in scores)
    N = len(scores) - P
    rp = sum(ranks[t] for t, (_s, y) in enumerate(scores) if y == 1)
    return (rp - P * (P + 1) / 2.0) / (P * N)


def test_link_auc_exact_python_replay(spark):
    import numpy as np

    from gliner_spark.operators.embeddings import link_auc

    rng = np.random.RandomState(5)
    edges = sorted(
        {((i * 7) % 15, (i * 11 + 3) % 15) for i in range(40)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    verts = sorted({v for e in edges for v in e})
    vecs = {v: rng.rand(4) for v in verts}
    edf = spark.createDataFrame(edges, "src long, dst long")
    vdf = spark.createDataFrame(
        [(v, [float(x) for x in vecs[v]]) for v in verts],
        "id long, vec array<double>",
    )
    row = link_auc(edf, vdf, neg_per_pos=2, seed=13).first()
    expect = _auc_py(
        edges, vecs, 2, 13, len(verts), verts
    )
    assert abs(row["auc"] - expect) < 1e-9
    assert row["n_pos"] == len(set(edges))


def test_link_auc_separates_good_from_random(spark):
    import numpy as np

    from gliner_spark.operators.embeddings import link_auc

    # two 8-cliques: edges only within cliques
    edges = []
    for base in (0, 50):
        for a in range(8):
            for b in range(8):
                if a != b:
                    edges.append((base + a, base + b))
    edf = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({v for e in edges for v in e})
    # "good" embedding: clique indicator -> within-clique dot = 1
    good = spark.createDataFrame(
        [(v, [1.0, 0.0] if v < 50 else [0.0, 1.0]) for v in verts],
        "id long, vec array<double>",
    )
    rng = np.random.RandomState(3)
    rand = spark.createDataFrame(
        [(v, [float(x) for x in rng.rand(2)]) for v in verts],
        "id long, vec array<double>",
    )
    auc_good = link_auc(edf, good, neg_per_pos=3, seed=1).first()["auc"]
    auc_rand = link_auc(edf, rand, neg_per_pos=3, seed=1).first()["auc"]
    assert auc_good > 0.85
    assert auc_good > auc_rand


def test_svd_embed_iters_zero_honored(spark):
    """ADVICE r4: iters counts refinement rounds — iters=0 must run
    zero of them (init pass + factorization only) rather than being
    clamped to 1, and negatives raise."""
    import pytest

    rng = np.random.RandomState(4)
    M = rng.rand(8, 3) @ rng.rand(3, 6)
    df = spark.createDataFrame(
        [(i, j, float(M[i, j])) for i in range(8) for j in range(6)],
        "i long, j long, w double",
    )
    word, ctx, sig = svd_embed(df, k=3, iters=0, seed=5)
    E = _collect_emb(word, 8, 3)
    C = _collect_emb(ctx, 6, 3)
    # rank-3 matrix: even the un-refined subspace reconstructs it
    assert np.max(np.abs(E @ C.T - M)) < 1e-6
    with pytest.raises(ValueError, match="iters"):
        svd_embed(df, k=3, iters=-1, seed=5)
