"""Motif finding vs a brute-force python enumerator.

The oracle enumerates bindings term-by-term over the edge list with
shared-name consistency — the *definition* of the motif semantics — so
any join-order or column-plumbing bug in operators/motif.find shows up
as a set mismatch. Graphs are small (<=40 edges) and deterministic.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.motif import _parse, find, triangle_counts


def _brute(edge_list, pattern, vertex_ids=None):
    """Set of tuples of named-element bindings, vertex names sorted then
    edge names in term order (mirrors find()'s output column order)."""
    terms = _parse(pattern)
    fresh = itertools.count()
    for t in terms:
        if t["src"] is None:
            t["src"] = f"__anon{next(fresh)}"
        if t["is_edge"] and t["dst"] is None:
            t["dst"] = f"__anon{next(fresh)}"
    if vertex_ids is None:
        vertex_ids = sorted({v for e in edge_list for v in e})
    pos = [t for t in terms if t["is_edge"] and not t["neg"]]
    neg = [t for t in terms if t["neg"]]
    vonly = [t for t in terms if not t["is_edge"]]
    eset = set(edge_list)

    bindings = [{}]
    for t in pos:
        nxt = []
        for b in bindings:
            for i, (s, d) in enumerate(edge_list):
                nb = dict(b)
                if t["src"] in nb and nb[t["src"]] != s:
                    continue
                nb[t["src"]] = s
                if t["dst"] in nb and nb[t["dst"]] != d:
                    continue
                nb[t["dst"]] = d
                if t["edge"]:
                    nb[("edge", t["edge"])] = i
                nxt.append(nb)
        bindings = nxt
    for t in vonly:
        nxt = []
        for b in bindings:
            if t["src"] in b:
                if b[t["src"]] in vertex_ids:
                    nxt.append(b)
            else:
                for v in vertex_ids:
                    nb = dict(b)
                    nb[t["src"]] = v
                    nxt.append(nb)
        bindings = nxt
    bindings = [
        b
        for b in bindings
        if all((b[t["src"]], b[t["dst"]]) not in eset for t in neg)
    ]
    named_vs = sorted(
        n
        for b in bindings[:1]
        for n in b
        if isinstance(n, str) and not n.startswith("__anon")
    ) or sorted(
        n
        for t in terms
        for n in (t["src"], t["dst"])
        if n and not n.startswith("__anon")
    )
    named_es = [t["edge"] for t in pos if t["edge"]]
    outs = set()
    for b in bindings:
        row = tuple(b[n] for n in named_vs) + tuple(
            edge_list[b[("edge", e)]] for e in named_es
        )
        outs.add(row)
    return outs, named_vs, named_es


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 5), (5, 3),
    (2, 4), (4, 2), (5, 5), (6, 1), (2, 6), (6, 7),
]


def _spark_find(spark, pattern, vertices=None):  # noqa: F811
    e = spark.createDataFrame(EDGES, "src long, dst long")
    v = (
        spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
        if vertices
        else None
    )
    df = find(e, pattern, vertices=v)
    rows = set()
    for r in df.collect():
        vals = []
        for c in df.columns:
            item = r[c]
            if "src" in item.__fields__:
                vals.append((item["src"], item["dst"]))
            else:
                vals.append(item["id"])
        rows.add(tuple(vals))
    return rows


@pytest.mark.parametrize(
    "pattern",
    [
        "(a)-[e]->(b)",
        "(a)-[e]->(b); (b)-[e2]->(c)",
        "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)",
        "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)",
        "(a)-[e]->(a)",
        "(a)-[]->(b); !(b)-[]->(a)",
        "(a)-[]->()",
        "()-[]->(b); (b)-[]->()",
        "(a)-[]->(b); (c)-[]->(d)",
        "(a); (b); !(a)-[]->(b)",
        "(a)-[]->(b); (a)-[]->(c); !(b)-[]->(c); !(c)-[]->(b)",
    ],
)
def test_find_matches_bruteforce(spark, pattern):  # noqa: F811
    want, named_vs, named_es = _brute(EDGES, pattern)
    got = _spark_find(spark, pattern)
    assert got == want, f"{pattern}: {len(got)} vs {len(want)}"


def test_vertex_structs_carry_attributes(spark):  # noqa: F811
    e = spark.createDataFrame(EDGES, "src long, dst long")
    v = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 8)], "id long, name string"
    )
    df = find(e, "(a)-[]->(b)", vertices=v)
    r = {(x["a"]["id"], x["a"]["name"], x["b"]["name"]) for x in df.collect()}
    assert (1, "n1", "n2") in r
    assert all(nm == f"n{i}" for i, nm, _ in r)


def test_edge_structs_carry_payload(spark):  # noqa: F811
    e = spark.createDataFrame(
        [(1, 2, 0.5), (2, 3, 0.9)], "src long, dst long, w double"
    )
    df = find(e, "(a)-[e]->(b); (b)-[e2]->(c)")
    row = df.collect()[0]
    assert (row["e"]["w"], row["e2"]["w"]) == (0.5, 0.9)


def test_rejects_bad_patterns(spark):  # noqa: F811
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        find(e, "(a)-[e]->(b); !(a)-[x]->(b)")  # named negated edge
    with pytest.raises(ValueError):
        find(e, "!(a)-[]->(b)")  # negation with unbound vertices
    with pytest.raises(ValueError):
        find(e, "(a)<-[e]-(b)")  # unsupported direction syntax
    with pytest.raises(ValueError):
        find(e, "(a)-[e]->(b); (b)-[e]->(c)")  # edge name reuse
    with pytest.raises(ValueError):
        find(e, "(a)-[b]->(b)")  # vertex/edge name clash
    with pytest.raises(ValueError):
        find(e, "")


def test_triangle_counts_bruteforce(spark):  # noqa: F811
    und = {tuple(sorted(e)) for e in EDGES if e[0] != e[1]}
    verts = sorted({v for e in und for v in e})
    want = {}
    for a, b, c in itertools.combinations(verts, 3):
        if (
            (a, b) in und
            and (b, c) in und
            and (a, c) in und
        ):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["id"]: r["n_triangles"] for r in triangle_counts(e).collect()
    }
    assert got == want


def test_clustering_coefficient_bruteforce(spark):  # noqa: F811
    from gliner_spark.operators.motif import clustering_coefficient

    und = {tuple(sorted(e)) for e in EDGES if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nbs in adj.items():
        d = len(nbs)
        tri = sum(
            1
            for x, y in itertools.combinations(sorted(nbs), 2)
            if (x, y) in und
        )
        coeff = round(2.0 * tri / (d * (d - 1)), 6) if d >= 2 else 0.0
        want[v] = (d, tri, coeff)
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["id"]: (r["degree"], r["n_triangles"], r["coefficient"])
        for r in clustering_coefficient(e).collect()
    }
    assert got == want
