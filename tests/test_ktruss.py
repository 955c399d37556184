"""k-truss extraction vs a sequential-peel python oracle, plus the
clique/tail structural identities."""

import itertools

import pytest
from pyspark.sql import Row

from gliner_spark.operators.graph import k_truss


def py_k_truss(edge_list, k):
    edges = {
        (min(a, b), max(a, b)) for a, b in edge_list if a != b
    }
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {
            (a, b)
            for a, b in edges
            if len(adj[a] & adj[b]) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


def _clique(verts):
    return list(itertools.combinations(verts, 2))


PSEUDO = sorted({((i * 5) % 16, (i * 9 + 2) % 16) for i in range(60)})
CLIQUE_TAIL = _clique(range(5)) + [(4, 10), (10, 11), (11, 12)]


@pytest.mark.parametrize("edges", [PSEUDO, CLIQUE_TAIL])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_k_truss_matches_python_peel(spark, edges, k):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {(r.a, r.b) for r in k_truss(df, k).collect()}
    assert got == py_k_truss(edges, k)


def test_k_truss_clique_identities(spark):
    # K5: every edge sits in 3 triangles -> survives k=5, dies at k=6;
    # the pendant tail never has support and drops at k>=3
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in CLIQUE_TAIL]
    )
    k5 = {(r.a, r.b) for r in k_truss(df, 5).collect()}
    assert k5 == set(_clique(range(5)))
    assert k_truss(df, 6).count() == 0
    # k=2 is the whole (canonicalized) edge set
    assert k_truss(df, 2).count() == len(CLIQUE_TAIL)


def test_k_truss_cascade_peel(spark):
    # triangle chain: (0,1,2) and (1,2,3) share edge (1,2); removing
    # nothing at k=3, but at k=4 the outer edges (support 1) drop
    # first and the shared edge (support 2) must CASCADE out in a
    # later round — recomputation against survivors is the contract
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    assert {(r.a, r.b) for r in k_truss(df, 3).collect()} == set(edges)
    assert k_truss(df, 4).count() == 0


def test_k_truss_rejects_bad_k(spark):
    df = spark.createDataFrame([Row(src=0, dst=1)])
    with pytest.raises(ValueError):
        k_truss(df, 1)
