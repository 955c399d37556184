"""PageRank vs a numpy power-iteration oracle on small graphs."""

import numpy as np
import pytest
from pyspark.sql import Row

from gliner_spark.operators.graph import pagerank


def numpy_pagerank(n, edge_list, damping=0.85, iters=50):
    out_deg = np.zeros(n)
    for s, _d in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return r


CASES = [
    # simple chain with a cycle
    [(0, 1), (1, 2), (2, 0), (2, 3)],
    # star: hub collects rank
    [(1, 0), (2, 0), (3, 0), (4, 0)],
    # dangling node 3 (no out-edges)
    [(0, 1), (1, 2), (2, 3)],
]


@pytest.mark.parametrize("edges", CASES)
def test_pagerank_matches_numpy(spark, edges):
    n = max(max(e) for e in edges) + 1
    df = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d) for s, d in edges]
    )
    got = {r.entity_id: r.rank
           for r in pagerank(df, max_iter=50, tol=1e-10).collect()}
    exp = numpy_pagerank(n, edges)
    for i in range(n):
        assert got[i] == pytest.approx(exp[i], abs=1e-6), (i, got, exp)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_on_pipeline_edges(spark):
    """Runs over real canonicalized edges end-to-end (rank mass sums to 1,
    hub entities outrank leaves)."""
    from gliner_spark.operators.graph import build_edges
    from gliner_spark.operators.linking import canonicalize, rewrite_triples
    from gliner_spark.operators.ner import extract_entities
    from gliner_spark.operators.relations import extract_triples
    from gliner_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_convs=10)
    ents = extract_entities(t, ["person", "organization", "tool"])
    triples = extract_triples(t, ["uses"], ["person", "organization", "tool"])
    cm = canonicalize(ents, jaccard_threshold=0.5)
    edges = build_edges(rewrite_triples(triples, cm))
    pr = pagerank(edges)
    rows = pr.collect()
    assert len(rows) > 5
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-4)


def numpy_ppr(n, edge_list, seeds, damping=0.85, iters=50):
    out_deg = np.zeros(n)
    for s, _d in edge_list:
        out_deg[s] += 1
    p = np.zeros(n)
    p[list(seeds)] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) * p + damping * (inflow + dangling * p)
    return r


@pytest.mark.parametrize("edges", CASES)
@pytest.mark.parametrize("seeds", [[0], [0, 2]])
def test_personalized_pagerank_matches_numpy(spark, edges, seeds):
    from gliner_spark.operators.graph import personalized_pagerank

    n = max(max(e) for e in edges) + 1
    df = spark.createDataFrame(
        [Row(subj_id=s, obj_id=d) for s, d in edges]
    )
    got = {
        r.entity_id: r.rank
        for r in personalized_pagerank(
            df, seeds, max_iter=50, tol=1e-10
        ).collect()
    }
    exp = numpy_ppr(n, edges, seeds)
    for i in range(n):
        assert got[i] == pytest.approx(exp[i], abs=1e-6), (i, got, exp)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_ppr_unreachable_vertices_rank_zero(spark):
    """Restart concentrates mass on the seed component: vertices with
    no path from the seeds stay at exactly 0."""
    from gliner_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(
        [Row(subj_id=0, obj_id=1), Row(subj_id=2, obj_id=3)]
    )
    got = {
        r.entity_id: r.rank
        for r in personalized_pagerank(df, [0], max_iter=20).collect()
    }
    assert got[2] == 0.0 and got[3] == 0.0
    assert got[0] > 0 and got[1] > 0


def test_ppr_isolated_seed_is_dangling(spark):
    """A seed with no edges still anchors the walk: it is dangling, so
    its mass recycles to the seed set — ranks stay a distribution."""
    from gliner_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([Row(subj_id=0, obj_id=1)])
    got = {
        r.entity_id: r.rank
        for r in personalized_pagerank(
            df, [7], max_iter=30, tol=1e-12
        ).collect()
    }
    assert got[7] == pytest.approx(1.0, abs=1e-9)
    assert got[0] == 0.0 and got[1] == 0.0


def test_ppr_rejects_empty_seeds(spark):
    from gliner_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([Row(subj_id=0, obj_id=1)])
    with pytest.raises(ValueError):
        personalized_pagerank(df, [])


def test_katz_matches_numpy(spark):
    import numpy as np
    from gliner_spark.operators.graph import katz_centrality

    pairs = [(i % 29, (i * 5 + 2) % 29) for i in range(70)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["id"]: r["katz"]
        for r in katz_centrality(e, alpha=0.0625, max_iter=4).collect()
    }
    und = sorted({p for p in pairs if p[0] != p[1]})
    verts = sorted({v for p in und for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for a, b in und:
        A[idx[a], idx[b]] = 1.0
    x = np.ones(len(verts))
    for _ in range(4):
        x = 1.0 + 0.0625 * (A.T @ x)
    for v in verts:
        assert got[v] == x[idx[v]], v  # dyadic alpha: EXACT equality


def test_katz_tol_converges_early(spark):
    from gliner_spark.operators.graph import katz_centrality

    # DAG: converges exactly after depth rounds; tol stops the loop
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["id"]: r["katz"]
        for r in katz_centrality(
            e, alpha=0.25, max_iter=50, tol=1e-12
        ).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 1.25
    assert got[3] == 1.0 + 0.25 * 1.25
