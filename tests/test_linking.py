"""Entity linking: MinHash-LSH recall on near-dups, Jaccard verify
precision, connected components correctness, canonical determinism."""

import pytest
from pyspark.sql import Row

from gliner_spark.operators.linking import (
    canonicalize,
    candidate_pairs,
    connected_components,
    minhash_signatures,
    rewrite_triples,
    surface_table,
    verified_pairs,
)


def _norm(s):
    import re

    return re.sub(r"[-_\s]+", " ", s.lower()).strip()


def _shingles(s, n=3):
    p = f" {_norm(s)} "
    return {p[i : i + n] for i in range(max(len(p) - n + 1, 1))}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


MENTIONS = [
    ("Acme Corp", "organization", 5),
    ("acme-corp", "organization", 3),     # normalizes identically → J=1.0
    ("Acme Corporation", "organization", 2),
    ("Alice Chen", "person", 4),
    ("alice chen", "person", 2),          # J=1.0 with Alice Chen
    ("Zurich", "location", 3),
    ("Redis", "tool", 2),                 # singleton
]


@pytest.fixture(scope="module")
def mentions_df(spark):
    rows = []
    for i, (text, label, n) in enumerate(MENTIONS):
        for j in range(n):
            rows.append(
                Row(conv_id=f"c{j}", turn_idx=i, start=0, end=len(text),
                    text=text, label=label, score=0.9)
            )
    return spark.createDataFrame(rows)


def test_surface_table(spark, mentions_df):
    st = {r.surface: (r.n_mentions, r.ent_type)
          for r in surface_table(mentions_df).collect()}
    assert st["Acme Corp"] == (5, "organization")
    assert st["Redis"] == (2, "tool")
    assert len(st) == len(MENTIONS)


def test_minhash_identical_normalized_surfaces_have_equal_sigs(spark, mentions_df):
    sigs = {r.surface: tuple(r.sig)
            for r in minhash_signatures(surface_table(mentions_df)).collect()}
    assert sigs["Acme Corp"] == sigs["acme-corp"]
    assert sigs["Alice Chen"] == sigs["alice chen"]
    assert sigs["Acme Corp"] != sigs["Zurich"]
    assert all(len(s) == 64 for s in sigs.values())


def test_sig_expr_matches_column_composition(spark, mentions_df):
    """minhash_sig_expr (one parsed SQL expression) must produce values
    identical to composing minhash_array's perm_min Columns — the SQL
    form exists only to kill ~2 s of py4j expression-construction driver
    overhead per query, never to change a single signature value."""
    from pyspark.sql import functions as F

    from gliner_spark.operators.linking import minhash_array, shingle_set

    surfaces = surface_table(mentions_df)
    hashes, coeffs, perm_min = minhash_array(
        shingle_set(F.col("surface"), 3), 64, 42
    )
    with_h = surfaces.select("surface_id", hashes.alias("_hs"))
    old = {
        r.surface_id: r.sig
        for r in with_h.select(
            "surface_id",
            F.array(
                *[perm_min(F.col("_hs"), a, b) for a, b in coeffs]
            ).alias("sig"),
        ).collect()
    }
    new = {
        r.surface_id: r.sig
        for r in minhash_signatures(surfaces, 64, 3, 42).collect()
    }
    assert new == old


def test_lsh_finds_identical_normalized_pairs(spark, mentions_df):
    sigs = minhash_signatures(surface_table(mentions_df))
    ids = {r.surface: r.surface_id for r in sigs.collect()}
    pairs = {(r.id_a, r.id_b) for r in candidate_pairs(sigs).collect()}

    def pair(a, b):
        return (min(ids[a], ids[b]), max(ids[a], ids[b]))

    assert pair("Acme Corp", "acme-corp") in pairs
    assert pair("Alice Chen", "alice chen") in pairs


def test_verified_pairs_match_python_jaccard(spark, mentions_df):
    surfaces = surface_table(mentions_df)
    sigs = minhash_signatures(surfaces)
    pairs = candidate_pairs(sigs)
    got = {(r.surface_a, r.surface_b): r.jaccard
           for r in verified_pairs(pairs, surfaces, 0.3).collect()}
    for (a, b), j in got.items():
        assert abs(j - _jaccard(a, b)) < 1e-9
        assert j >= 0.3


def test_connected_components_chain(spark):
    verts = spark.createDataFrame([Row(id=s) for s in "abcdef"])
    edges = spark.createDataFrame(
        [Row(id_a="a", id_b="b"),
         Row(id_a="b", id_b="c"),
         Row(id_a="d", id_b="e")]
    )
    comp = {r.id: r.component
            for r in connected_components(verts, edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["f"] == "f"


def test_connected_components_long_chain(spark):
    """O(log n) star convergence on a 40-node path graph (the diameter
    case that killed plain label propagation). small_solve=0 forces the
    distributed star rounds — the default would take the single-task
    union-find shortcut on a graph this small."""
    n = 40
    verts = spark.createDataFrame([Row(id=i) for i in range(n)])
    edges = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(n - 1)]
    )
    comp = {r.id: r.component
            for r in connected_components(verts, edges, small_solve=0)
            .collect()}
    assert set(comp.values()) == {0}


def test_connected_components_local_solver_matches_star(spark):
    """The small_solve union-find path and the distributed star path must
    produce identical memberships — random multi-component graphs with
    duplicate and self edges."""
    import random

    rng = random.Random(3)
    n = 120
    edges_py = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    verts = spark.createDataFrame([Row(id=i) for i in range(n)])
    edges = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges_py]
    )
    local = {r.id: r.component
             for r in connected_components(verts, edges).collect()}
    star = {r.id: r.component
            for r in connected_components(verts, edges, small_solve=0)
            .collect()}
    assert local == star
    # oracle: python union-find over the same edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges_py:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    assert local == expected


def test_canonicalize_end_to_end(spark, mentions_df):
    cm = canonicalize(mentions_df, jaccard_threshold=0.5).collect()
    by_surface = {r.surface: r for r in cm}
    # acme-corp normalizes identically to Acme Corp → same entity; canonical
    # is the most-mentioned surface
    assert by_surface["acme-corp"].canonical == "Acme Corp"
    assert by_surface["acme-corp"].entity_id == by_surface["Acme Corp"].entity_id
    assert by_surface["alice chen"].canonical == "Alice Chen"
    # singletons canonicalize to themselves
    assert by_surface["Redis"].canonical == "Redis"
    assert by_surface["Zurich"].canonical == "Zurich"
    # deterministic across runs
    cm2 = canonicalize(mentions_df, jaccard_threshold=0.5).collect()
    assert sorted(map(tuple, cm)) == sorted(map(tuple, cm2))


def test_rewrite_triples(spark, mentions_df):
    cm = canonicalize(mentions_df, jaccard_threshold=0.5)
    triples = spark.createDataFrame(
        [Row(conv_id="c0", turn_idx=0, subj="acme-corp", pred="uses",
             obj="Redis", score=0.8, start=0, end=5),
         Row(conv_id="c0", turn_idx=1, subj="Unknown Surface", pred="uses",
             obj="alice chen", score=0.7, start=0, end=5)]
    )
    out = {(r.subj, r.obj): (r.subj_canonical, r.obj_canonical)
           for r in rewrite_triples(triples, cm).collect()}
    assert out[("acme-corp", "Redis")] == ("Acme Corp", "Redis")
    # unlinked surfaces pass through as their own canonical
    assert out[("Unknown Surface", "alice chen")] == (
        "Unknown Surface", "Alice Chen")


def test_rewrite_plan_broadcasts_map(spark, mentions_df):
    cm = canonicalize(mentions_df, jaccard_threshold=0.5)
    triples = spark.createDataFrame(
        [Row(conv_id="c0", turn_idx=0, subj="acme-corp", pred="uses",
             obj="Redis", score=0.8, start=0, end=5)]
    )
    plan = (
        rewrite_triples(triples, cm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
