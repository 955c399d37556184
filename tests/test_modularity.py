"""Newman modularity (operators/graph.py::modularity)."""
import pytest

from gliner_spark.operators.graph import label_propagation, modularity


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_two_cliques_perfect_partition(spark):
    # two 3-cliques joined by one bridge edge: textbook case
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    comm = [(v, 0) for v in (1, 2, 3)] + [(v, 1) for v in (4, 5, 6)]
    out = {
        r["label"]: r.asDict()
        for r in modularity(
            _df(spark, edges, "src long, dst long"),
            _df(spark, comm, "id long, label int"),
        ).collect()
    }
    # m=7; each clique: e_c=3, d_c=7 -> 3/7 - 49/196 = 0.178571
    for lab in (0, 1):
        c = out[lab]
        assert (c["n_vertices"], c["internal_edges"], c["degree_sum"]) == (
            3, 3, 7,
        )
        assert c["contribution"] == round(3 / 7 - 49 / 196, 6)
    q = sum(c["contribution"] for c in out.values())
    assert q == pytest.approx(2 * round(3 / 7 - 49 / 196, 6))
    # the same graph under ONE community scores worse (Q = 0 exactly:
    # e_c/m = 1, (d_c/2m)^2 = 1)
    one = modularity(
        _df(spark, edges, "src long, dst long"),
        _df(spark, [(v, 9) for v in range(1, 7)], "id long, label int"),
    ).collect()
    assert len(one) == 1 and one[0]["contribution"] == 0.0


def test_unlabeled_vertices_become_singletons(spark):
    edges = [(1, 2), (2, 3)]
    comm = [(1, 5), (2, 5)]  # vertex 3 missing
    out = {
        r["label"]: r.asDict()
        for r in modularity(
            _df(spark, edges, "src long, dst long"),
            _df(spark, comm, "id long, label int"),
        ).collect()
    }
    assert set(out) == {5, -1}
    assert out[-1]["n_vertices"] == 1
    assert out[-1]["internal_edges"] == 0


def test_python_bruteforce_parity_on_lpa_output(spark):
    pairs = [(i % 23, (i * 7 + 3) % 23) for i in range(60)]
    e = _df(spark, pairs, "src long, dst long")
    comm = label_propagation(e, max_iter=3)
    got = {
        r["label"]: r["contribution"]
        for r in modularity(e, comm).collect()
    }
    # brute force
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    lab = {r["id"]: r["label"] for r in comm.collect()}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(und)
    labels = {lab.get(v, -1) for v in deg}
    want = {}
    for c in labels:
        ec = sum(
            1 for a, b in und if lab.get(a, -1) == c and lab.get(b, -1) == c
        )
        dc = sum(d for v, d in deg.items() if lab.get(v, -1) == c)
        want[c] = round(ec / m - (dc * dc) / (4.0 * m * m), 6)
    assert got == want


# ------------------------------------------------------- assortativity


def _assort_py(pairs):
    import collections

    e = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg = collections.Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    m = len(e)
    s_jk = sum(deg[u] * deg[v] for u, v in e)
    s_j = sum(deg[u] + deg[v] for u, v in e)
    s_jj = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in e)
    mu = s_j / (2.0 * m)
    den = s_jj / (2.0 * m) - mu * mu
    if den == 0.0:
        return None
    return (s_jk / m - mu * mu) / den


def test_assortativity_star_is_minus_one(spark):
    from gliner_spark.operators.graph import assortativity

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    row = assortativity(df).first()
    assert row["m_edges"] == 4
    assert abs(row["r"] - (-1.0)) < 1e-12


def test_assortativity_regular_graph_is_null(spark):
    from gliner_spark.operators.graph import assortativity

    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    assert assortativity(cyc).first()["r"] is None


def test_assortativity_matches_python_on_pseudorandom(spark):
    from gliner_spark.operators.graph import assortativity

    pairs = [((i * 37) % 50, (i * i * 11 + 3) % 50) for i in range(300)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = assortativity(df).first()
    expect = _assort_py(pairs)
    assert abs(row["r"] - expect) < 1e-12


def test_assortativity_dedup_and_self_loops(spark):
    from gliner_spark.operators.graph import assortativity

    # duplicates (both orientations) + self loops must not change r
    base = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    noisy = base + [(b, a) for a, b in base] + [(4, 4), (1, 1)] + base
    r1 = assortativity(
        spark.createDataFrame(base, "src long, dst long")
    ).first()
    r2 = assortativity(
        spark.createDataFrame(noisy, "src long, dst long")
    ).first()
    assert r1 == r2
