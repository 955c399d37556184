"""Adamic-Adar / common-neighbor link prediction (graph.link_predict)
against a hand-computed oracle on a 5-vertex graph, plus the hub-cap
and anti-join contracts."""

import math

from pyspark.sql import functions as F

from gliner_spark.operators.graph import link_predict

# undirected house graph: degrees 1:2, 2:3, 3:3, 4:3, 5:1
EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]


def _got(df):
    return sorted(
        (r.a, r.b, r.n_common, r.aa)
        for r in df.select("a", "b", "n_common", "aa").collect()
    )


def test_link_predict_matches_hand_oracle(spark):
    g = spark.createDataFrame(EDGES, "src long, dst long")
    inv_ln3 = round(1.0 / math.log(3.0), 6)
    want = [
        # (1,4) via middles 2 and 3 (both deg 3)
        (1, 4, 2, round(2.0 / math.log(3.0), 6)),
        # (2,5) and (3,5) via middle 4 (deg 3)
        (2, 5, 1, inv_ln3),
        (3, 5, 1, inv_ln3),
    ]
    assert _got(link_predict(g)) == want


def test_link_predict_direction_and_duplicates_collapse(spark):
    """Reversed + duplicated directed edges are one undirected edge."""
    noisy = EDGES + [(b, a) for a, b in EDGES] + EDGES[:3]
    g = spark.createDataFrame(noisy, "src long, dst long")
    base = spark.createDataFrame(EDGES, "src long, dst long")
    assert _got(link_predict(g)) == _got(link_predict(base))


def test_link_predict_min_common_filters(spark):
    g = spark.createDataFrame(EDGES, "src long, dst long")
    got = _got(link_predict(g, min_common=2))
    assert [(a, b, n) for a, b, n, _ in got] == [(1, 4, 2)]


def test_link_predict_hub_cap_excludes_middles(spark):
    """max_degree=2 leaves only deg<=2 middles (vertices 1 and 5);
    vertex 1's single wedge (2,3) is an existing edge, so the output is
    empty — the cap excludes MIDDLES, it does not filter endpoints."""
    g = spark.createDataFrame(EDGES, "src long, dst long")
    assert link_predict(g, max_degree=2).count() == 0


def test_link_predict_never_suggests_existing_edges(spark):
    g = spark.createDataFrame(EDGES, "src long, dst long")
    out = {(r.a, r.b) for r in link_predict(g).collect()}
    assert out.isdisjoint({(min(a, b), max(a, b)) for a, b in EDGES})


def test_link_predict_wedge_join_is_equi_join(spark):
    """Plan contract: the wedge self-join and the known-edge anti-join
    are hash/sort-merge EQUI joins — never a nested-loop product."""
    g = spark.createDataFrame(EDGES, "src long, dst long")
    plan = (
        link_predict(g)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
