"""Graph materialization: canonical node/edge tables (SURVEY §7.1 step 5).

nodes: one row per canonical entity (entity_id = xxhash64(canonical) — the
       deterministic id scheme from operators/linking.py).
edges: one row per (subj_id, pred, obj_id) with evidence counts, built from
       canonicalized triples. Aggregation is a plain hash agg → map-side
       partial combine; the shuffle key (edge identity) is the natural
       partitioning for downstream graph consumers.

Both preserve provenance counts rather than raw evidence rows; the raw
triples table remains the evidence store (pointer, not copy — at 100 TB
duplicating evidence into edges would double the write volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_nodes(
    canon_map: DataFrame, canonical_triples: DataFrame | None = None
) -> DataFrame:
    """canon_map(surface, entity_id, canonical, ent_type, n_mentions,
    entity_mentions) → nodes(entity_id, canonical, ent_type, n_mentions,
    n_surfaces).

    When `canonical_triples` is given, nodes additionally cover every
    triple ENDPOINT — surfaces outside the linking scope (e.g. spans
    longer than link_max_tokens) are their own canonical form with
    ent_type null; without this, edges would dangle."""
    linked = canon_map.groupBy("entity_id", "canonical").agg(
        F.max(F.struct(F.col("n_mentions"), F.col("ent_type")))
        .getField("ent_type")
        .alias("ent_type"),
        F.sum("n_mentions").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_surfaces"),
    )
    if canonical_triples is None:
        return linked
    endpoints = (
        canonical_triples.select(
            F.col("subj_id").alias("entity_id"),
            F.col("subj_canonical").alias("canonical"),
        )
        .union(
            canonical_triples.select(
                F.col("obj_id").alias("entity_id"),
                F.col("obj_canonical").alias("canonical"),
            )
        )
        .distinct()
    )
    unlinked = endpoints.join(
        linked.select("entity_id"), "entity_id", "left_anti"
    ).select(
        "entity_id",
        "canonical",
        F.lit(None).cast("string").alias("ent_type"),
        F.lit(0).cast("long").alias("n_mentions"),
        F.lit(1).cast("long").alias("n_surfaces"),
    )
    return linked.unionByName(unlinked)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 15,
    tol: float = 1e-6,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    init_ranks: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Damped PageRank over the entity graph → (entity_id, rank).

    Driver-controlled power iteration (Catalyst cannot iterate — same
    pattern as connected components): contributions = rank/out_degree
    pushed along edges, rank' = (1−d)/N + d·(Σ contributions + dangling
    mass/N), localCheckpoint per iteration to cut lineage. Converges when
    the L1 delta drops below `tol`. Each iteration is one equi-join + one
    hash agg on int64 keys — the canonical iterative-graph shuffle shape.

    Exactly ONE driver job per iteration: the iteration-k aggregate
    computes BOTH the L1 delta (convergence) and the dangling mass the
    NEXT iteration needs (Σ rank over out-degree-null vertices), so
    dangling mass is carried forward instead of re-collected. On a real
    cluster at 15 iterations that halves the job round-trips.

    `init_ranks` warm-starts the iteration from a previous result
    (any (id, rank)-shaped frame, e.g. a persisted rank table from
    before an edge append): known vertices take their old rank, new
    vertices 1/n, and the vector is renormalized to sum 1. Power
    iteration contracts at factor `damping` per round toward the NEW
    graph's fixpoint, so starting ||old − new|| ≈ ε away (a small edge
    delta) instead of ||uniform − new|| cuts the rounds to reach `tol`
    roughly by log(ε)/log(d) — the incremental-refresh path after
    appends, same converged values as a cold run (parity-pinned in
    test_graph_communities.py). Costs one extra pre-loop job (the
    normalization sum + warm dangling mass together).

    `weight_col` makes the walk WEIGHTED: contributions become
    rank·w/Σ_out w instead of rank/out_degree — the KG edge table's
    `n_evidence` is the natural weight (evidence-weighted centrality).
    Parallel (src, dst) rows SUM their weights (the multigraph fold);
    non-positive weights are dropped (a zero-weight edge carries no
    walk mass, and dropping them keeps every out-weight sum strictly
    positive). The unweighted path is untouched: it still DISTINCTs
    multi-edges, so `weight_col` with all-1 weights equals unweighted
    only on simple graphs (multiplicity is the point of weights).
    """
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).where(F.col("src") != F.col("dst")).distinct().localCheckpoint()
        out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .where((F.col("src") != F.col("dst")) & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint()
        )
        out_deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    # vertices carry their out-degree for the whole loop (deg null =
    # dangling) — one join here instead of one per iteration
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .join(out_deg.withColumnRenamed("src", "id"), "id", "left")
        .localCheckpoint()
    )
    # one pre-loop job: n and the dangling-vertex count together
    stats = verts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("deg").isNull(), 1).otherwise(0)).alias("nd"),
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        return verts.select("id").withColumn("rank", F.lit(0.0)).select(
            F.col("id").alias("entity_id"), "rank"
        )
    if init_ranks is None:
        # uniform initial ranks: Σ 1/n over dangling
        dangling = stats["nd"] / n
        ranks = verts.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    else:
        ic = init_ranks.columns
        prev = init_ranks.select(
            F.col(ic[0]).cast("long").alias("id"),
            F.col(ic[1]).cast("double").alias("r0"),
        )
        warm = (
            verts.join(prev, "id", "left")
            .select(
                "id",
                "deg",
                F.coalesce("r0", F.lit(1.0 / n)).alias("r0"),
            )
            .localCheckpoint(eager=False)
        )
        ws = warm.agg(
            F.sum("r0").alias("s"),
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("r0"))),
                F.lit(0.0),
            ).alias("m"),
        ).collect()[0]
        s = ws["s"] or 1.0
        dangling = ws["m"] / s
        ranks = warm.select(
            "id", "deg", (F.col("r0") / F.lit(s)).alias("rank")
        )
    base = (1.0 - damping) / n
    contrib = (
        F.col("rank") / F.col("deg")
        if weight_col is None
        else F.col("rank") * F.col("w") / F.col("deg")
    )

    for _ in range(max_iter):
        contribs = (
            ranks.join(e, ranks.id == e.src)
            .select(F.col("dst").alias("id"), contrib.alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            ranks.select("id", "deg", F.col("rank").alias("old_rank"))
            .join(contribs, "id", "left")
            .select(
                "id",
                "deg",
                "old_rank",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            # lazy: the fused aggregate below both materializes this
            # round's ranks and measures convergence in a single job
            .localCheckpoint(eager=False)
        )
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("d"),
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("m"),
        ).collect()[0]
        dangling = row["m"]
        ranks = new_ranks.select("id", "deg", "rank")
        if row["d"] < tol:
            break
    return ranks.select(F.col("id").alias("entity_id"), "rank")


def bfs_distances(
    edges: DataFrame,
    landmarks: DataFrame | list[int],
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS shortest hop counts → (landmark, id, hop).

    KG reachability: for each landmark entity, every vertex reachable
    within `max_hops` directed hops and its shortest distance (the
    GraphFrames `shortestPaths` landmark semantics; GLiNER itself has no
    graph analytics — this serves neighborhood/reachability queries over
    the materialized edge table, e.g. "everything within 3 hops of this
    canonical entity").

    Driver-controlled frontier expansion (Catalyst cannot iterate — the
    same pattern as pagerank/connected components): each round joins the
    CURRENT frontier one hop along edges (int64 equi-join on src),
    anti-joins vertices already reached (first reach = shortest hop, so
    no min-aggregate is ever needed), and localCheckpoints the new
    frontier to cut lineage. Rounds are bounded by `max_hops` and stop
    early when the frontier empties, so the loop is O(max_hops) joins
    regardless of graph size, and per-round work is proportional to the
    FRONTIER, not the reached set. At 100 TB the edge table is bucketed
    on src so every round's probe joins Exchange-free on the big side;
    the anti-join key (landmark, id) is the natural partitioning of the
    accumulating distance table.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    if isinstance(landmarks, DataFrame):
        lm = landmarks.select(
            F.col(landmarks.columns[0]).cast("long").alias("landmark")
        ).distinct()
    else:
        lm = edges.sparkSession.createDataFrame(
            [(int(x),) for x in landmarks], "landmark long"
        )
    dist = lm.select(
        "landmark",
        F.col("landmark").alias("id"),
        F.lit(0).cast("int").alias("hop"),
    ).localCheckpoint()
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select("landmark", F.col("dst").alias("id"))
            .distinct()
            .join(
                dist.select("landmark", "id"),
                ["landmark", "id"],
                "left_anti",
            )
            .select(
                "landmark", "id", F.lit(hop).cast("int").alias("hop")
            )
            # eager: materializes this round's frontier in one job; the
            # isEmpty() below reads the checkpointed rows back cheaply
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # unions of already-checkpointed frames: lineage stays shallow
        dist = dist.union(nxt)
        frontier = nxt
    return dist


def build_edges(canonical_triples: DataFrame) -> DataFrame:
    """Canonicalized triples (subj_id, subj_canonical, pred, obj_id,
    obj_canonical, score, …) → edges with evidence stats."""
    return canonical_triples.groupBy(
        "subj_id", "subj_canonical", "pred", "obj_id", "obj_canonical"
    ).agg(
        F.count(F.lit(1)).alias("n_evidence"),
        F.max("score").alias("score"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def link_predict(
    edges: DataFrame,
    max_degree: int = 64,
    min_common: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Common-neighbor link prediction with Adamic-Adar weighting over
    an UNDIRECTED view of the edge list → (a, b, n_common, aa) for
    non-adjacent vertex pairs sharing >= min_common neighbors. The KG-
    completion primitive: aa = sum over shared neighbors m of
    1/ln(deg(m)) (Adamic & Adar 2003) — a low-degree shared neighbor is
    stronger evidence for the missing edge (a, b) than a hub.

    Scale shape: one self-join of the adjacency on the MIDDLE vertex
    (int64 equi-join) emits each wedge once (neighbor pair ordered
    a < b), one hash agg on (a, b) folds count + the AA sum, one
    left_anti against the existing undirected edges removes known
    pairs. Wedge fan-out is quadratic in the middle's degree, so
    middles with deg > max_degree are EXCLUDED (the standard hub cap:
    a hub's 1/ln(deg) contribution is negligible while its pair
    blow-up is the whole skew problem; the cap is part of the operator
    contract, mirrored by the oracle). aa is rounded to 6dp so the
    cross-engine double sum is comparison-stable.

    A degree-1 middle cannot form a wedge, so ln(deg) >= ln 2 — no
    division-by-zero path exists.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    mid = adj.join(deg.where(F.col("deg") <= max_degree), "v")
    pairs = (
        mid.alias("l")
        .join(mid.alias("r"), "v")
        .where(F.col("l.n") < F.col("r.n"))
        .select(
            F.col("l.n").alias("a"),
            F.col("r.n").alias("b"),
            F.col("l.deg").alias("deg"),
        )
    )
    cand = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.round(F.sum(F.lit(1.0) / F.log(F.col("deg"))), 6).alias("aa"),
    )
    return cand.join(und, ["a", "b"], "left_anti").where(
        F.col("n_common") >= min_common
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    damping: float = 0.85,
    max_iter: int = 15,
    tol: float = 1e-6,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """Personalized PageRank (random walk with restart to a SEED set)
    → (entity_id, rank): relevance of every entity GIVEN the seeds —
    the related-entity recommendation primitive over the KG.

    Same driver-loop power iteration and per-iteration shuffle shape as
    `pagerank` (one equi-join + one hash agg on int64 keys, one fused
    delta+dangling collect per iteration, localCheckpoint lineage
    cuts), with the uniform teleport vector replaced by
    p(v) = 1/|seeds| on seeds, 0 elsewhere:

        rank' = (1-d)*p + d*(inflow + dangling_mass*p)

    so both the restart and the dangling mass return to the seeds, and
    vertices unreachable from the seed set stay at exactly 0. Seeds are
    added to the vertex set even when isolated (an isolated seed is
    dangling), keeping total mass at 1. Kept separate from `pagerank`
    rather than a seeds=None branch so the global variant's
    oracle-pinned operand shapes stay untouched.
    """
    if not seeds:
        raise ValueError("personalized_pagerank needs >= 1 seed")
    seed_ids = sorted({int(s) for s in seeds})
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seed_df = spark.createDataFrame(
        [(s,) for s in seed_ids], "id long"
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .union(seed_df)
        .distinct()
        .join(out_deg.withColumnRenamed("src", "id"), "id", "left")
        .withColumn(
            "p",
            F.when(
                F.col("id").isin(seed_ids),
                F.lit(1.0 / len(seed_ids)),
            ).otherwise(F.lit(0.0)),
        )
        .localCheckpoint()
    )
    dangling = verts.agg(
        F.coalesce(
            F.sum(F.when(F.col("deg").isNull(), F.col("p"))), F.lit(0.0)
        ).alias("m")
    ).collect()[0]["m"]
    ranks = verts.withColumn("rank", F.col("p")).localCheckpoint()

    for _ in range(max_iter):
        contribs = (
            ranks.join(e, ranks.id == e.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            ranks.select(
                "id", "deg", "p", F.col("rank").alias("old_rank")
            )
            .join(contribs, "id", "left")
            .select(
                "id",
                "deg",
                "p",
                "old_rank",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.lit(dangling) * F.col("p")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("d"),
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("m"),
        ).collect()[0]
        dangling = row["m"]
        ranks = new_ranks.select("id", "deg", "p", "rank")
        if row["d"] < tol:
            break
    return ranks.select(F.col("id").alias("entity_id"), "rank")


def random_walks(
    edges: DataFrame,
    walk_len: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 7,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """Deterministic DeepWalk-style random walks over the directed
    graph → (start_id, rep, step, vertex): `walks_per_vertex` walks of
    up to `walk_len` steps from every vertex — the graph→sequence
    corpus generator feeding embedding training (node2vec with p=q=1).

    The neighbor pick is the repo's cross-engine uniform: the walk at
    (start, rep, step, cur) takes neighbor index
    md5("{seed}|{start}|{rep}|{step}|{cur}")[:8 hex] mod out_degree,
    which Python's hashlib and DuckDB reproduce bit-exactly — walks
    are a pure function of (graph, seed), so regenerating a shard
    yields the identical corpus (resume/backfill safe).

    Scale shape: neighbors are indexed ONCE (row_number over (src,
    dst) — the only window), then each step is two int64 equi-joins
    (frontier⨝degree to compute the pick, (cur, idx)⨝(src, idx) to
    take it) — no adjacency arrays, so a hub costs one edge row per
    walk that touches it, not a collected neighbor list. Walks
    reaching a dangling vertex terminate (the degree join drops
    them); per-step work is proportional to the LIVE walk count.
    Driver loop with eager localCheckpoint lineage cuts, early exit
    when every walk has terminated.
    """
    from pyspark.sql import Window

    if walk_len < 0 or walks_per_vertex < 1:
        raise ValueError("walk_len >= 0 and walks_per_vertex >= 1")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    iedges = e.withColumn(
        "idx", (F.row_number().over(w) - 1).cast("long")
    ).localCheckpoint()
    # distinct column names on each probe side: deg and iedges share
    # lineage, and a bare self-join on src would be ambiguous
    deg = (
        iedges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "dsrc")
    )
    step_edges = iedges.select(
        F.col("src").alias("esrc"),
        F.col("idx").alias("eidx"),
        F.col("dst").alias("edst"),
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    frontier = verts.select(
        F.col("id").alias("start_id"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.lit(walks_per_vertex - 1).cast("long"),
            )
        ).alias("rep"),
    ).select(
        "start_id",
        "rep",
        F.lit(0).cast("long").alias("step"),
        F.col("start_id").alias("vertex"),
    ).localCheckpoint()
    out = frontier
    for t in range(walk_len):
        pick = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(seed),
                            F.col("start_id"),
                            F.col("rep"),
                            F.lit(t),
                            F.col("vertex"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.col("deg"),
        )
        nxt = (
            frontier.join(deg, frontier.vertex == F.col("dsrc"))
            .withColumn("pick", pick)
            .join(
                step_edges,
                (F.col("vertex") == F.col("esrc"))
                & (F.col("pick") == F.col("eidx")),
            )
            .select(
                "start_id",
                "rep",
                F.lit(t + 1).cast("long").alias("step"),
                F.col("edst").alias("vertex"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        out = out.union(nxt)
        frontier = nxt
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    seed: int = 7,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """Deterministic node2vec walks (Grover & Leskovec 2016) →
    (start_id, rep, step, vertex): second-order biased walks where the
    unnormalized weight of stepping cur→w given the previous vertex is
    1/p for the return edge (w == prev), 1 when prev→w is an edge (the
    triangle/BFS direction), 1/q otherwise (the outward/DFS direction).
    p = q = 1 degenerates to DeepWalk; the first step (no prev) is
    uniform. Directed semantics: "w at distance 1 from prev" means the
    directed edge prev→w exists.

    The weighted pick stays a pure function of (graph, seed):
    u = md5("{seed}|n2v|{start}|{rep}|{step}|{cur}")[:8] / 2^32 (the
    repo's cross-engine uniform), candidates ordered by dst carry a
    running weight sum, and the walk takes the unique candidate whose
    cumulative interval contains u·total. The running sum adds the
    same operands in the same (dst-ordered) sequence on every engine,
    so the python replay in test_node2vec.py is EXACT, not
    statistical — shard regeneration yields the identical corpus.

    Scale shape per step: one int64 equi-join expands live walks to
    their candidate edges (a hub costs one row per visiting walk, no
    adjacency arrays), one (prev, w) equi-join probes the
    triangle-edge predicate against the edge table, and the pick is a
    per-walk window whose partitions are deg(cur) rows — bounded by
    the max out-degree, never by graph size. Walks terminate at
    dangling vertices; per-step work ∝ live walks. Driver loop with
    eager localCheckpoint lineage cuts.
    """
    from pyspark.sql import Window

    if walk_len < 0 or walks_per_vertex < 1:
        raise ValueError("walk_len >= 0 and walks_per_vertex >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("node2vec needs p > 0 and q > 0")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    probe = e.select(
        F.col("src").alias("psrc"), F.col("dst").alias("pdst")
    ).withColumn("is_nbr", F.lit(1))
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    frontier = verts.select(
        F.col("id").alias("start_id"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.lit(walks_per_vertex - 1).cast("long"),
            )
        ).alias("rep"),
    ).select(
        "start_id",
        "rep",
        F.lit(None).cast("long").alias("prev"),
        F.col("start_id").alias("vertex"),
    ).localCheckpoint()
    out = frontier.select(
        "start_id", "rep", F.lit(0).cast("long").alias("step"), "vertex"
    )
    win = Window.partitionBy("start_id", "rep").orderBy("w")
    for t in range(walk_len):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(seed),
                            F.lit("n2v"),
                            F.col("start_id"),
                            F.col("rep"),
                            F.lit(t),
                            F.col("vertex"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**32))
        )
        cand = (
            frontier.join(e, frontier.vertex == e.src)
            .select(
                "start_id", "rep", "prev", "vertex",
                F.col("dst").alias("w"),
            )
            .join(
                probe,
                (F.col("prev") == F.col("psrc"))
                & (F.col("w") == F.col("pdst")),
                "left",
            )
            .withColumn(
                "alpha",
                F.when(F.col("w") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("is_nbr").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q)),
            )
        )
        picked = (
            cand.withColumn(
                "cum",
                F.sum("alpha").over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "target",
                u
                * F.sum("alpha").over(
                    win.rowsBetween(
                        Window.unboundedPreceding,
                        Window.unboundedFollowing,
                    )
                ),
            )
            .where(
                (F.col("cum") > F.col("target"))
                & (F.col("cum") - F.col("alpha") <= F.col("target"))
            )
        )
        nxt = picked.select(
            "start_id",
            "rep",
            F.col("vertex").alias("prev"),
            F.col("w").alias("vertex"),
        ).localCheckpoint()
        if nxt.isEmpty():
            break
        out = out.union(
            nxt.select(
                "start_id",
                "rep",
                F.lit(t + 1).cast("long").alias("step"),
                "vertex",
            )
        )
        frontier = nxt
    return out


def _local_core_numbers(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Sequential Batagelj-Zaversnik (2003) min-degree peel via a lazy
    heap — the small-graph finisher (same rationale as linking's
    `_local_membership`: on a graph that fits one task, every
    distributed peel round is pure scheduler latency)."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set = set()
    core: dict[int, int] = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue  # stale heap entry
        k = max(k, deg[v])
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    small_solve: int = 500_000,
) -> DataFrame:
    """The k-core of the UNDIRECTED view of the edge list: the maximal
    subgraph in which every vertex has degree >= k, as its canonical
    edge set (a, b) with a < b. The dense-region extractor for KG
    cleanup — vertices outside even the 2-core are leaves/chains that
    carry no corroborating structure, while a high-k core is the
    mutually-evidenced heart of the graph (Seidman 1983).

    Standard iterative peel, Spark-shaped: each round computes degrees
    with ONE hash agg over the live edges (both endpoints unioned in)
    and removes vertices below k with TWO int64 anti-joins, then
    localCheckpoints the survivor edge set (lineage cut). Rounds needed
    = peel depth, usually far below the diameter (each round strips a
    whole onion layer, not one vertex like the sequential algorithm);
    per-round work is proportional to the LIVE edge set, which only
    shrinks; one O(1) isEmpty probe per round (an empty graph yields an
    empty bad set, so the loop needs no second probe). When the edge
    multiset fits one task (`small_solve`) the whole peel collapses
    into one sequential pass on the driver — peel rounds on a small
    graph are pure scheduler latency (same rationale, and parity
    pinning, as linking's `_local_membership` CC finisher).
    """
    if k < 1:
        raise ValueError("k >= 1")
    spark = edges.sparkSession
    live = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    if live.count() <= small_solve:
        pairs = [(r.a, r.b) for r in live.collect()]
        core = _local_core_numbers(pairs)
        keep = [
            (a, b) for a, b in pairs if core[a] >= k and core[b] >= k
        ]
        return spark.createDataFrame(keep, "a long, b long")
    while True:
        deg = (
            live.select(F.col("a").alias("v"))
            .unionAll(live.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        bad = deg.where(F.col("deg") < k).select("v").localCheckpoint()
        if bad.isEmpty():
            return live
        live = (
            live.join(bad, live["a"] == bad["v"], "left_anti")
            .join(bad, live["b"] == bad["v"], "left_anti")
            .localCheckpoint()
        )


def core_numbers(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    small_solve: int = 500_000,
) -> DataFrame:
    """Core number of every vertex of the undirected view → (v, core):
    the largest k such that v belongs to the k-core; isolated-by-dedup
    vertices never appear (no edges), leaf vertices get 1. A one-column
    density/centrality feature for entity curation — cheap to join onto
    nodes, robust to hubs (a hub wired to leaves has a LOW core number,
    unlike its degree or PageRank).

    Distributed path: iterated h-index refinement (Lu et al. 2016,
    "Vital nodes identification in complex networks"): h(v) starts at
    degree and each round becomes the H-index of the neighbors'
    current values; initialized at degree the sequence is monotone
    non-increasing and its fixpoint is exactly the coreness. Each
    round is one int64 equi-join (adjacency x current h) + one hash
    agg folding the neighbor values into a sorted array whose H-index
    is a pure expression, + one O(1) delta collect; the round count is
    a small graph property (12 on the 2M-edge bench graph) INDEPENDENT
    of k_max x onion depth — measured 1.75x faster than the
    level-restart peel it replaced (85.9s -> 49.2s at 2M edges), which
    paid one scheduler round per onion layer per level. Caveat: the
    per-vertex neighbor-value array materializes deg(v) ints in one
    aggregation buffer — fine for KG-scale hubs (a 10M-degree hub is a
    ~40 MB row); the bucketed two-phase H-index is the refinement if a
    corpus ever exceeds that. Below `small_solve` edges the whole
    decomposition runs as ONE sequential Batagelj-Zaversnik pass on
    the driver (distributed == local == sequential-oracle parity
    pinned in test_kcore.py).
    """
    live = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    if live.count() <= small_solve:
        core = _local_core_numbers(
            [(r.a, r.b) for r in live.collect()]
        )
        if not core:
            return spark.createDataFrame([], "v long, core int")
        return spark.createDataFrame(
            [(int(v), int(c)) for v, c in sorted(core.items())],
            "v long, core int",
        )
    adj = (
        live.select(F.col("a").alias("v"), F.col("b").alias("n"))
        .unionAll(
            live.select(F.col("b").alias("v"), F.col("a").alias("n"))
        )
        .localCheckpoint()
    )
    h = (
        adj.groupBy("v")
        .agg(F.count(F.lit(1)).cast("int").alias("core"))
        .localCheckpoint()
    )
    # H-index of the desc-sorted neighbor values: arr is sorted, so
    # h = |{i : arr[i] >= i}| (1-based) — a pure fold, no UDF
    h_index = F.expr(
        "aggregate(zip_with(arr, sequence(1, size(arr)),"
        " (x, i) -> case when x >= i then 1 else 0 end),"
        " 0, (acc, y) -> acc + y)"
    ).cast("int")
    while True:
        nh = adj.join(
            h.select(F.col("v").alias("n"), F.col("core").alias("hn")),
            "n",
        )
        newh = (
            nh.groupBy("v")
            .agg(F.sort_array(F.collect_list("hn"), asc=False).alias("arr"))
            .select("v", h_index.alias("core"))
            .localCheckpoint()
        )
        delta = (
            h.select("v", F.col("core").alias("old"))
            .join(newh, "v")
            .agg(F.sum(F.abs(F.col("core") - F.col("old"))).alias("d"))
            .collect()[0]["d"]
        ) or 0  # sum over zero rows is NULL (degenerate empty graph)
        h = newh
        if delta == 0:
            return h


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
) -> DataFrame:
    """Walk corpus (random_walks / node2vec_walks output) → weighted
    skip-gram training pairs (center, context, n): every ordered vertex
    pair co-occurring within `window` steps on the same walk, counted
    across the corpus — the word2vec-input generator that completes the
    DeepWalk/node2vec pipeline (graph → walks → pairs; the embedding
    GEMM itself is training and out of scope per SURVEY §2.11).

    Plan: one self-equi-join on the walk identity (start_id, rep) with
    a |Δstep| ≤ window residual, then a map-side-combining (center,
    context) count agg. Per-walk fan-out is bounded by
    (walk_len+1)·2·window — never graph-degree-dependent — and the
    aggregate's shuffle carries only distinct pairs. Deterministic
    because the walks are (md5-uniform picks), so shard regeneration
    reproduces the exact pair multiset.
    """
    if window < 1:
        raise ValueError("window >= 1")
    a = walks.select(
        "start_id",
        "rep",
        F.col("step").alias("_sa"),
        F.col("vertex").alias("center"),
    )
    b = walks.select(
        "start_id",
        "rep",
        F.col("step").alias("_sb"),
        F.col("vertex").alias("context"),
    )
    return (
        a.join(b, ["start_id", "rep"])
        .where(
            (F.abs(F.col("_sa") - F.col("_sb")) <= window)
            & (F.col("_sa") != F.col("_sb"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def aggregate_messages(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    send_to_dst=None,
    send_to_src=None,
    agg=None,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """GraphFrames `aggregateMessages` as a plain DataFrame combinator:
    build the TRIPLET view (every edge joined with its endpoint
    attributes), evaluate `send_to_dst` / `send_to_src` message
    expressions over it, and fold the messages per receiving vertex
    with `agg` → (id, agg-columns). The one GraphFrames primitive the
    graph module didn't already cover (find/motifs, shortestPaths,
    labelPropagation, pageRank, triangleCount, CC/SCC all have
    dedicated operators) — this is the extension surface for writing
    NEW per-vertex passes without touching operator internals; the
    dedicated operators stay hand-tuned (e.g. LPA's min(struct) pick).

    Message expressions are pyspark Columns over the triplet schema:
    edge columns keep their names; vertex attributes appear twice,
    prefixed `src_` and `dst_` (e.g. `F.col("src_rank") /
    F.col("src_deg")` is pagerank's contribution). `agg` is one
    aggregate Column or a list of them. `vertices` may be omitted when
    messages only need edge columns (degree counting). Plan shape: at
    most two int64 equi-joins (vertex attrs onto edges — bucketed
    edges make them Exchange-free at scale) + one hash agg on the
    receiver id; messages to src and dst union BEFORE the aggregate,
    so one shuffle folds both directions.
    """
    if send_to_dst is None and send_to_src is None:
        raise ValueError("need send_to_dst and/or send_to_src")
    if agg is None:
        raise ValueError("need an aggregate expression")
    aggs = agg if isinstance(agg, (list, tuple)) else [agg]
    triplets = edges
    if vertices is not None:
        attrs = [c for c in vertices.columns if c != id_col]
        src_v = vertices.select(
            F.col(id_col).alias(src_col),
            *[F.col(c).alias(f"src_{c}") for c in attrs],
        )
        dst_v = vertices.select(
            F.col(id_col).alias(dst_col),
            *[F.col(c).alias(f"dst_{c}") for c in attrs],
        )
        triplets = triplets.join(src_v, src_col).join(dst_v, dst_col)
    msgs = []
    if send_to_dst is not None:
        msgs.append(
            triplets.select(
                F.col(dst_col).alias("id"), send_to_dst.alias("_msg")
            )
        )
    if send_to_src is not None:
        msgs.append(
            triplets.select(
                F.col(src_col).alias("id"), send_to_src.alias("_msg")
            )
        )
    out = msgs[0]
    for m in msgs[1:]:
        out = out.unionByName(m)
    return out.groupBy("id").agg(*aggs)


def k_truss(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 200,
) -> DataFrame:
    """Edges of the k-truss → canonical undirected (a, b), a < b: the
    maximal subgraph in which every edge participates in at least k−2
    triangles OF THAT SUBGRAPH. The edge-support analog of k_core —
    strictly stronger cohesion (a k-truss is a (k−1)-core but not vice
    versa), the standard dense-community extractor over the KG edge
    table where k_core is too hub-lenient.

    Iterative peel, per round: one node-iterator triangle enumeration
    over the LIVE edges (two-hop int64 equi-join + closing semi-join,
    the same shape as motif.triangle_counts), an explode of each
    triangle into its three edges + one (a, b) hash agg for support,
    one join dropping edges below k−2, and one O(1) count collect for
    convergence. Work per round ∝ live wedges, which only shrinks;
    localCheckpoint cuts the iterative lineage. Converges when a round
    drops nothing (support is recomputed against the SURVIVING edges
    each round — peeling an edge can demote its triangle partners).
    """
    if k < 2:
        raise ValueError("k-truss needs k >= 2")
    live = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    thresh = k - 2
    if thresh == 0:
        return live  # every edge has >= 0 support
    n_live = live.count()
    for _ in range(max_rounds):
        if n_live == 0:
            return live
        tri = (
            live.alias("ab")
            .join(live.alias("bc"), F.col("ab.b") == F.col("bc.a"))
            .select(
                F.col("ab.a").alias("x"),
                F.col("ab.b").alias("y"),
                F.col("bc.b").alias("z"),
            )
            .join(
                live.alias("ac"),
                (F.col("x") == F.col("ac.a"))
                & (F.col("z") == F.col("ac.b")),
                "left_semi",
            )
        )
        support = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionAll(
                tri.select(F.col("y").alias("a"), F.col("z").alias("b"))
            )
            .unionAll(
                tri.select(F.col("x").alias("a"), F.col("z").alias("b"))
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("supp"))
        )
        keep = (
            live.join(support, ["a", "b"], "left")
            .where(F.coalesce("supp", F.lit(0)) >= thresh)
            .select("a", "b")
            .localCheckpoint()
        )
        n_keep = keep.count()
        if n_keep == n_live:
            return keep
        live, n_live = keep, n_keep
    raise RuntimeError(f"k_truss did not converge in {max_rounds} rounds")


def _local_scc(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan over an edge list → {vertex: min id of its SCC}.
    The driver-local finisher for strongly_connected_components (same
    rationale as _local_core_numbers / linking's union-find finisher:
    below small_solve the remaining graph fits one task and distributed
    phases are pure scheduler latency)."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = 0
    for root in sorted(verts):
        if root in index:
            continue
        # explicit DFS stack of (vertex, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                rep = min(members)
                for w in members:
                    comp[w] = rep
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def strongly_connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    small_solve: int = 500_000,
    max_phases: int = 50,
) -> DataFrame:
    """Strongly connected components of the DIRECTED graph →
    (id, component), component = the smallest vertex id in the SCC (a
    canonical, engine-independent representative). The directed
    complement of linking's connected_components: cycles in derived KG
    edges (sameAs loops, circular provenance) are exactly the non-
    singleton SCCs.

    Distributed path, per phase (the classic trim + forward-backward
    decomposition):
      1. TRIM — vertices missing either an in-edge or an out-edge in
         the remaining graph cannot sit on a cycle: settle them as
         singleton SCCs and drop their edges. Repeats via the phase
         loop until a trim settles nothing (a DAG trims away entirely,
         which is why trimming comes first: pure FW-BW would peel one
         root per phase there).
      2. FORWARD min-label to convergence: color(v) = min id over
         vertices that reach v (rounds ∝ diameter, one int64 equi-join
         + min agg + delta collect per round, localCheckpoint cuts).
      3. BACKWARD sweep from each color ROOT (color(r) = r) along
         REVERSED edges restricted to the root's color class: the
         reached set of r is exactly r's SCC (everything in it reaches
         r forward — color r — and is reached by r backward). Settle
         those with component = min member id, drop their edges, next
         phase.
    Below `small_solve` remaining edges the whole residue is solved by
    one driver-local iterative Tarjan pass (parity-pinned vs the
    distributed path in test_scc.py). All joins are int64 equi-joins;
    per-phase work is proportional to the REMAINING graph, which
    shrinks by every settled SCC — at 100 TB the remaining-edge table
    is bucketed on src so the propagation probes join Exchange-free.
    """
    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("GLINER_SCC_DEBUG"))

    def _log(msg):
        if _dbg:
            print(f"[scc +{_time.time() - _t0:7.1f}s] {msg}", flush=True)

    _t0 = _time.time()
    spark = edges.sparkSession
    e0 = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    settled_parts: list[DataFrame] = []
    remaining = e0
    for _phase in range(max_phases):
        n_edges = remaining.count()
        _log(f"phase {_phase}: {n_edges} edges remain")
        if n_edges == 0:
            break
        if n_edges <= small_solve:
            comp = _local_scc(
                [(r.src, r.dst) for r in remaining.collect()]
            )
            if comp:
                settled_parts.append(
                    spark.createDataFrame(
                        [(int(v), int(c)) for v, c in sorted(comp.items())],
                        "id long, component long",
                    )
                )
            remaining = None
            break
        verts = (
            remaining.select(F.col("src").alias("id"))
            .union(remaining.select(F.col("dst").alias("id")))
            .distinct()
        )
        has_out = remaining.select(F.col("src").alias("id")).distinct()
        has_in = remaining.select(F.col("dst").alias("id")).distinct()
        core = has_out.join(has_in, "id").localCheckpoint()
        trimmed = verts.join(core, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        ).localCheckpoint()
        n_trimmed = trimmed.count()
        if n_trimmed:
            settled_parts.append(trimmed)
            remaining = (
                remaining.join(
                    core.withColumnRenamed("id", "src"), "src", "left_semi"
                )
                .join(
                    core.withColumnRenamed("id", "dst"), "dst", "left_semi"
                )
                .select("src", "dst")
                .localCheckpoint()
            )
            # a core vertex can lose ALL its edges here (every edge
            # touched a trimmed vertex) and vanish from the remaining
            # graph — it has no edge to any unsettled vertex, so no
            # cycle: settle it as a singleton or it is never emitted
            still = (
                remaining.select(F.col("src").alias("id"))
                .union(remaining.select(F.col("dst").alias("id")))
                .distinct()
                .localCheckpoint()
            )
            vanished = core.join(still, "id", "left_anti").select(
                "id", F.col("id").alias("component")
            )
            if not vanished.isEmpty():
                settled_parts.append(vanished.localCheckpoint())
            _log(f"trimmed {n_trimmed}")
            # re-trim only while it is still paying its way: the trim
            # convergence TAIL settled 915/100/15 edges for ~4 s a pass
            # at 2M edges (measured r5) — below 0.5% of the remaining
            # edge count, stop re-trimming and color; any vertex a
            # further trim would have settled just becomes a singleton
            # root in the coloring (trim is purely an optimization)
            if n_trimmed * 200 >= n_edges:
                continue
            core = still
        # forward min-label with POINTER DOUBLING: each round first
        # propagates colors one edge-hop (color(v) ← min inbound), then
        # shortcuts color(v) ← color(color(v)) — valid because color
        # witnesses reachability and reachability is transitive, so the
        # fixpoint (min id reaching v) is unchanged. The shortcut
        # compresses rounds when improved labels align with the
        # propagation direction (random-id graphs: 17 → 7 rounds at 2M
        # edges, measured r5); it is NOT a worst-case bound — a cycle
        # whose ids DESCEND along the edges still pays O(diameter)
        # rounds (the min walks one hop per round and no pointer ever
        # improves), exactly like the r4 one-hop code and like any
        # label-propagation scheme without hop sets. The pointer side
        # keeps only strictly-improving entries (color < id): a ROOT r
        # (color(r)=r) — the key every member of a converging class
        # carries — never has a pointer entry, so the hot key meets an
        # empty build side; and because the pointer side shrinks as
        # classes converge, AQE flips the doubling join to broadcast in
        # late rounds, which removes the probe-side shuffle (and with
        # it the one-reducer hot-key placement) exactly when the skew
        # would appear.
        def _min_label_doubling(prop_edges, init_verts, tag):
            # Round-barrier discipline (r5, measured on a 64-cycle):
            # the pointer step is a SELF-JOIN of `stepped` with its own
            # projection, and chaining localCheckpoint() through a
            # self-join doubles DRIVER cost per round (self-join
            # disambiguation over accumulated dataset lineage — rounds
            # 15+ went 1 s → 2 s → … → 95 s). Two changes keep rounds
            # FLAT: (a) `stepped` is eagerly checkpointed BEFORE the
            # self-join, so both join sides hang off one LogicalRDD;
            # (b) the round barrier on `cols` is persist()+count() with
            # an explicit unpersist of the previous round, not a second
            # localCheckpoint. 24 anti-aligned rounds measured flat at
            # ~0.45 s after the fix.
            rounds = 0
            cols = init_verts.select("id", F.col("id").alias("color"))
            prev_cache = None
            while True:
                inbound = (
                    prop_edges.join(
                        cols.select(
                            F.col("id").alias("src"),
                            F.col("color").alias("c_src"),
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("c_src").alias("c_in"))
                )
                stepped = (
                    cols.join(inbound, "id", "left")
                    .select(
                        "id",
                        F.least(
                            "color", F.coalesce("c_in", F.col("color"))
                        ).alias("color"),
                        F.col("color").alias("old"),
                    )
                    .localCheckpoint()
                )
                ptr = stepped.where(F.col("color") < F.col("id")).select(
                    F.col("id").alias("_pid"),
                    F.col("color").alias("_pc"),
                )
                doubled = (
                    stepped.join(
                        ptr, F.col("color") == F.col("_pid"), "left"
                    )
                    .select(
                        "id",
                        F.least(
                            F.col("color"),
                            F.coalesce("_pc", F.col("color")),
                        ).alias("color"),
                        "old",
                    )
                    .persist()
                )
                # ONE action materializes the cache AND yields the
                # convergence scalar (fold-the-scalar rule)
                changed = doubled.where(
                    F.col("color") != F.col("old")
                ).count()
                if prev_cache is not None:
                    prev_cache.unpersist()
                prev_cache = doubled
                cols = doubled.select("id", "color")
                rounds += 1
                _log(f"{tag} round {rounds}: changed={changed}")
                if changed == 0:
                    break
            # the final round's cache backs the returned frame until the
            # phase materializes its consumers; the phase unpersists it
            # after the scc extraction is checkpointed
            _phase_caches.append(prev_cache)
            return cols

        _phase_caches: list = []
        _log("forward coloring start")
        colors = _min_label_doubling(remaining, core, "fw")
        # backward pass: the SAME doubled min-label on the REVERSED
        # class-restricted subgraph. Within class(r) every v→…→r path
        # stays in the class (proof in test_scc docstring), so
        # bcolor(v) = min{u ∈ class(v): v →* u} equals the class root r
        # exactly when v reaches r — i.e. exactly for SCC members.
        # Replaces the frontier BFS (O(SCC diameter) rounds, growing
        # union + isEmpty job per round: 14 rounds / 19 s at 2M edges,
        # measured r5); same worst-case round count, fewer rounds in
        # practice (14 → 7 measured) and a flat per-round cost.
        ce = (
            remaining.join(
                colors.select(
                    F.col("id").alias("src"), F.col("color").alias("_cs")
                ),
                "src",
            )
            .join(
                colors.select(
                    F.col("id").alias("dst"), F.col("color").alias("_cd")
                ),
                "dst",
            )
            .where(F.col("_cs") == F.col("_cd"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .localCheckpoint()
        )
        _log("backward coloring start")
        bcolors = _min_label_doubling(ce, core, "bw")
        scc = (
            colors.join(
                bcolors.select(
                    F.col("id").alias("_bid"), F.col("color").alias("_bc")
                ),
                F.col("id") == F.col("_bid"),
            )
            .where(F.col("color") == F.col("_bc"))
            .select("id", F.col("color").alias("component"))
            .localCheckpoint()
        )
        settled_parts.append(scc)
        for _c in _phase_caches:
            if _c is not None:
                _c.unpersist()
        _log("scc extracted")
        done = scc.select("id")
        remaining = (
            remaining.join(
                done.withColumnRenamed("id", "src"), "src", "left_anti"
            )
            .join(done.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint()
        )
        # same vanish rule as the trim step: an unsettled vertex whose
        # every edge touched an extracted SCC has no remaining cycle
        still = (
            remaining.select(F.col("src").alias("id"))
            .union(remaining.select(F.col("dst").alias("id")))
            .distinct()
        )
        vanished = (
            core.join(done, "id", "left_anti")
            .join(still, "id", "left_anti")
            .select("id", F.col("id").alias("component"))
        )
        if not vanished.isEmpty():
            settled_parts.append(vanished.localCheckpoint())
    else:
        raise RuntimeError(
            f"scc did not settle within {max_phases} phases"
        )
    if not settled_parts:
        return spark.createDataFrame([], "id long, component long")
    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.unionByName(p)
    return out


def label_propagation(
    edges: DataFrame,
    max_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities → (id, label).

    GraphFrames `labelPropagation` semantics made DETERMINISTIC: labels
    start as vertex ids; every round each vertex adopts the most
    frequent label among its undirected neighbors, ties broken by the
    SMALLEST label. Exactly `max_iter` synchronous rounds — LPA has no
    convergence guarantee (bipartite structures oscillate), so a pinned
    round count is the reproducible contract, and it makes the run
    COLLECT-FREE: zero driver jobs until the caller acts on the result
    (unlike pagerank/CC there is no convergence scalar to fetch).

    Each round is one int64 equi-join (undirected adjacency × labels) +
    one (id, label) count agg + one per-id min(struct(-count, label))
    fold — the argmax-with-min-tie pick as a pure aggregate, no window
    sort. Per-round shuffles key on (id, label) then (id); at 100 TB
    the adjacency is bucketed on src so the propagation join is
    Exchange-free on the big side, the same shape as bfs_distances /
    pagerank. localCheckpoint per round cuts the iterative lineage.

    GLiNER has no graph analytics; this serves "cluster canonical
    entities into densely co-mentioned communities" over the
    materialized edge table (SURVEY §2.8 extension surface, same
    rationale as pagerank/k-core). Parity: python replay in
    test_graph_communities.py; DuckDB unrolled-round oracle under the
    driver gate (`edge_agg` leg='lpa').
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    ud = (
        e.unionAll(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    # both directions are present, so every vertex appears as src and
    # receives one message per neighbor each round
    labels = (
        ud.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = ud.join(
            labels.select(F.col("id").alias("src"), "label"), "src"
        ).select(F.col("dst").alias("id"), "label")
        counts = msgs.groupBy("id", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            counts.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("label")
                    )
                ).alias("s")
            )
            .select("id", F.col("s.label").alias("label"))
            .localCheckpoint()
        )
    return labels


def hits(
    edges: DataFrame,
    max_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Kleinberg HITS hubs & authorities → (entity_id, hub, auth).

    Power iteration with L1 normalization each round: auth' ∝ Σ hub
    over in-edges, hub' ∝ Σ auth' over out-edges. The two normalizations
    are deferred to ONE fused job per round — hub_raw is computed from
    the UNnormalized auth_raw (normalization is a scalar multiple, so
    hub_raw/Σhub_raw is identical to normalizing mid-round), then a
    single aggregate over the joined frame collects both sums. So each
    round is two int64 equi-join+agg shuffles and exactly one driver
    job, the same budget as pagerank's fused delta/dangling collect.

    On the KG's bipartite slices (users → objects) hubs land on the
    source side and authorities on the target side; vertices with no
    in-(out-)edges get exact 0 auth (hub), exercising the coalesce
    paths. Round count pinned by the caller for oracle replay (DuckDB
    unrolls the same arithmetic per round — `pagerank_events`
    legs 'hub'/'auth'); numpy parity in test_graph_communities.py.
    """
    if max_iter < 1:
        raise ValueError("hits needs max_iter >= 1")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    if verts.isEmpty():
        return spark.createDataFrame(
            [], "entity_id long, hub double, auth double"
        )
    ranks = verts.select("id", F.lit(1.0).alias("hub"))
    joined = None
    sa = sh = 1.0
    for _ in range(max_iter):
        araw = (
            e.join(ranks.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("araw"))
        )
        hraw = (
            e.join(araw.select(F.col("id").alias("dst"), "araw"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("araw").alias("hraw"))
        )
        joined = (
            verts.join(araw, "id", "left")
            .join(hraw, "id", "left")
            .select(
                "id",
                F.coalesce("araw", F.lit(0.0)).alias("araw"),
                F.coalesce("hraw", F.lit(0.0)).alias("hraw"),
            )
            # lazy: the fused sums aggregate below materializes it
            .localCheckpoint(eager=False)
        )
        sums = joined.agg(
            F.sum("araw").alias("sa"), F.sum("hraw").alias("sh")
        ).collect()[0]
        sa = sums["sa"] or 1.0
        sh = sums["sh"] or 1.0
        ranks = joined.select(
            "id", (F.col("hraw") / F.lit(sh)).alias("hub")
        )
    return joined.select(
        F.col("id").alias("entity_id"),
        (F.col("hraw") / F.lit(sh)).alias("hub"),
        (F.col("araw") / F.lit(sa)).alias("auth"),
    )


_FM_PHI = 0.77351  # Flajolet–Martin bias correction constant


def neighborhood_function(
    edges: DataFrame,
    max_t: int = 8,
    method: str = "sketch",
    n_sketches: int = 32,
    seed: int = 17,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """ANF / HyperBall neighborhood function → (t, n_pairs) for
    t = 0..max_t: how many (v, u) pairs lie within distance t
    (self-pairs included, so NF(0) = |V|).

    The web-scale distance profile (Palmer et al., ANF, KDD 2002;
    Boldi et al., HyperBall): feed `effective_diameter` below, spot
    disconnected KGs (NF plateaus below |V|^2), and compare graph
    versions without any all-pairs work.

    method="sketch" (the 100 TB path): every vertex carries
    `n_sketches` Flajolet–Martin bitmask sketches of its distance-t
    ball, ONE int64 each — per round the sketch of v becomes
    OR(sketch(v), sketch(u) for v→u), which is a `bit_or` hash
    aggregate after a single int64 equi-join per round (the sketches
    are mergeable, so map-side combine applies; total state is
    O(V · n_sketches · 8 bytes) regardless of ball sizes — the whole
    point vs exact reach sets). The FM estimate per vertex is
    2^mean_k(lowest-zero-bit(m_k)) / 0.77351, computed with integer
    bit tricks (`bit_count((~m & (m+1)) − 1)`) — no float log in the
    hot path — with an HLL-style linear-counting correction from
    bit-0 occupancy for small balls (raw FM reads a 1-element ball
    ~1.8× high). Measured ≤7% error at 64 sketches on both a
    degree-1 chain graph and an expander (test_anf.py).

    method="exact" (the small-scale oracle twin): reach sets as
    distinct-id arrays merged by flatten+array_distinct — memory is
    O(ball size) per vertex, so this is for tests/oracles only; the
    integer outputs are engine-reproducible (DuckDB replays them with
    a recursive-CTE min-hop closure).

    Both emit exactly max_t+1 rows — after the fixpoint the value
    repeats (the loop stops computing; flat rows are filled in), so
    row count never depends on convergence round. Monotone
    convergence is detected on the exact mask/size checksum, not the
    estimate. Driver loop, one collect per round (scalar only).
    """
    if method not in ("sketch", "exact"):
        raise ValueError(f"unknown method {method!r}")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.where(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    rows: list[tuple[int, float]] = []

    if method == "exact":
        reach = verts.select(
            "id", F.array(F.col("id")).alias("rs")
        ).localCheckpoint()
        total = reach.agg(F.sum(F.size("rs"))).collect()[0][0] or 0
        rows.append((0, float(total)))
        for t in range(1, max_t + 1):
            contrib = e.join(reach, e.dst == reach.id).select(
                F.col("src").alias("id"), "rs"
            )
            reach = (
                reach.unionByName(contrib)
                .groupBy("id")
                .agg(
                    F.array_distinct(
                        F.flatten(F.collect_list("rs"))
                    ).alias("rs")
                )
                .localCheckpoint()
            )
            nxt = reach.agg(F.sum(F.size("rs"))).collect()[0][0] or 0
            rows.append((t, float(nxt)))
            if nxt == total:  # fixpoint: fill the grid without compute
                rows.extend(
                    (tt, float(nxt)) for tt in range(t + 1, max_t + 1)
                )
                break
            total = nxt
        return spark.createDataFrame(rows, "t int, n_pairs double")

    scols = [f"s{k}" for k in range(n_sketches)]
    init = []
    for k in range(n_sketches):
        h = (
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(seed * 1009 + k)),
                F.lit(1 << 32),
            )
            + 1
        )  # in [1, 2^32]: never zero, so h & -h is a clean power of two
        init.append(h.bitwiseAND(-h).alias(f"s{k}"))
    sk = verts.select("id", *init).localCheckpoint()

    # lowest ZERO bit index of m == bit_count((~m & (m+1)) - 1): pure
    # integer, no float log rounding hazards
    def _b(k: int):
        m = F.col(f"s{k}")
        return F.bit_count(F.bitwise_not(m).bitwiseAND(m + 1) - 1)

    mean_b = sum((_b(k) for k in range(n_sketches)), F.lit(0)) / float(
        n_sketches
    )
    fm = F.pow(F.lit(2.0), mean_b) / _FM_PHI
    # Small-range correction (the HLL linear-counting idea, applied to
    # FM bit-0 occupancy): P(bit0 set) = 1 - 2^-n, so while ANY sketch
    # still has bit 0 unset, n̂ = log(1 - c0/K) / log(1/2) is nearly
    # unbiased — raw FM reads tiny balls up to ~1.8× high. Once all K
    # bit-0s are set (n ≳ log2 K + a few), fall back to FM.
    c0 = sum(
        (F.col(c).bitwiseAND(F.lit(1)) for c in scols), F.lit(0)
    ).cast("double")
    est = F.when(
        c0 < float(n_sketches),
        F.log(1.0 - c0 / float(n_sketches)) / F.log(F.lit(0.5)),
    ).otherwise(fm)
    # one collect per round: estimate + exact monotone checksum (masks
    # only gain bits, so the sum is strictly increasing until fixpoint)
    chk = sum(
        (F.col(c).cast("double") for c in scols), F.lit(0.0)
    )
    agg0 = sk.agg(
        F.sum(est).alias("nf"), F.sum(chk).alias("chk")
    ).collect()[0]
    rows.append((0, float(agg0["nf"])))
    prev_chk = agg0["chk"]
    for t in range(1, max_t + 1):
        contrib = e.join(sk, e.dst == sk.id).select(
            F.col("src").alias("id"), *scols
        )
        sk = (
            sk.unionByName(contrib)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(c) for c in scols])
            .localCheckpoint()
        )
        a = sk.agg(
            F.sum(est).alias("nf"), F.sum(chk).alias("chk")
        ).collect()[0]
        rows.append((t, float(a["nf"])))
        if a["chk"] == prev_chk:
            rows.extend(
                (tt, float(a["nf"])) for tt in range(t + 1, max_t + 1)
            )
            break
        prev_chk = a["chk"]
    return spark.createDataFrame(rows, "t int, n_pairs double")


def effective_diameter(nf: DataFrame, q: float = 0.9) -> float:
    """Effective diameter from a neighborhood function: the
    (interpolated) smallest t where NF(t) ≥ q·NF(max_t) — the
    HyperANF convention. Driver-side over the max_t+1 collected rows.
    """
    pts = sorted((r["t"], r["n_pairs"]) for r in nf.collect())
    if not pts:
        return 0.0
    target = q * pts[-1][1]
    prev_t, prev_v = pts[0]
    if prev_v >= target:
        return float(prev_t)
    for t, v in pts[1:]:
        if v >= target:
            if v == prev_v:
                return float(t)
            return prev_t + (target - prev_v) / (v - prev_v)
        prev_t, prev_v = t, v
    return float(pts[-1][0])


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity per community → (label, n_vertices,
    internal_edges, degree_sum, contribution); total Q = sum of
    `contribution`.

    Q = Σ_c [ e_c/m − (d_c/(2m))² ] over the undirected simple view
    (a<b canonicalization) — THE standard quality score for a
    community assignment (e.g. `label_propagation` output): positive
    contributions mean denser-than-chance communities; Q near 0 says
    the partition is no better than random, the signal a KG pipeline
    uses to reject a bad canonicalization round.

    Shape: two vertex-key equi-joins to label the edge endpoints, two
    hash aggregations (per-community edge and degree sums), and the
    global m/degree totals ride back as a ONE-ROW crossJoin (scalar
    combine, the repo's established pattern). Arithmetic is exact
    integer counts divided in binary64 with a pinned operation order
    (e/m − d·d/(4·m·m), rounded 6dp) so the value is reproducible
    cross-engine. Vertices missing from `communities` form singleton
    communities of their own label = -1 − not silently dropped.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    lab = communities.select(
        F.col(id_col).alias("v"), F.col(label_col).alias("lab")
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    vl = deg.join(lab, "v", "left").select(
        "v", "deg", F.coalesce("lab", F.lit(-1)).alias("lab")
    )
    la = vl.select(F.col("v").alias("a"), F.col("lab").alias("la"))
    lb = vl.select(F.col("v").alias("b"), F.col("lab").alias("lb"))
    e_c = (
        und.join(la, "a")
        .join(lb, "b")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lab"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    d_c = vl.groupBy("lab").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("deg").alias("degree_sum"),
    )
    tot = und.agg(F.count(F.lit(1)).alias("m_edges"))
    m = F.col("m_edges").cast("double")
    e = F.coalesce("internal_edges", F.lit(0)).cast("double")
    d = F.col("degree_sum").cast("double")
    return (
        d_c.join(e_c, "lab", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("lab").alias("label"),
            "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).alias(
                "internal_edges"
            ),
            "degree_sum",
            F.when(
                F.col("m_edges") > 0,
                F.round(e / m - (d * d) / (4.0 * m * m), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("contribution"),
        )
    )


def distance_profile(
    edges: DataFrame,
    max_t: int = 4,
    method: str = "sketch",
    n_sketches: int = 32,
    seed: int = 17,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Per-vertex ball sizes → (id, t, ball) for t = 0..max_t:
    |{u : d(v, u) ≤ t}| including v itself — the per-vertex form of
    `neighborhood_function` (which is this summed over id), and the
    input `harmonic_centrality` folds.

    Same execution shape as neighborhood_function (one int64
    equi-join + one mergeable hash agg per round; sketch state
    O(V · n_sketches · 8 B)); the per-round snapshots are unioned
    lazily over already-checkpointed frames, so materializing the
    profile adds no extra jobs. method="exact" emits exact integer
    counts (the oracle twin); method="sketch" emits FM estimates with
    the linear-counting small-range correction (monotone in t within
    each estimator branch; the branch switchover is clamped by
    consumers, see harmonic_centrality).
    """
    if method not in ("sketch", "exact"):
        raise ValueError(f"unknown method {method!r}")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.where(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    snaps = []

    if method == "exact":
        reach = verts.select(
            "id", F.array(F.col("id")).alias("rs")
        ).localCheckpoint()
        snaps.append(
            reach.select(
                "id",
                F.lit(0).alias("t"),
                F.size("rs").cast("double").alias("ball"),
            )
        )
        for t in range(1, max_t + 1):
            contrib = e.join(reach, e.dst == reach.id).select(
                F.col("src").alias("id"), "rs"
            )
            reach = (
                reach.unionByName(contrib)
                .groupBy("id")
                .agg(
                    F.array_distinct(
                        F.flatten(F.collect_list("rs"))
                    ).alias("rs")
                )
                .localCheckpoint()
            )
            snaps.append(
                reach.select(
                    "id",
                    F.lit(t).alias("t"),
                    F.size("rs").cast("double").alias("ball"),
                )
            )
        out = snaps[0]
        for s in snaps[1:]:
            out = out.unionByName(s)
        return out

    scols = [f"s{k}" for k in range(n_sketches)]
    init = []
    for k in range(n_sketches):
        h = (
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(seed * 1009 + k)),
                F.lit(1 << 32),
            )
            + 1
        )
        init.append(h.bitwiseAND(-h).alias(f"s{k}"))
    sk = verts.select("id", *init).localCheckpoint()

    def _b(k: int):
        m = F.col(f"s{k}")
        return F.bit_count(F.bitwise_not(m).bitwiseAND(m + 1) - 1)

    mean_b = sum((_b(k) for k in range(n_sketches)), F.lit(0)) / float(
        n_sketches
    )
    fm = F.pow(F.lit(2.0), mean_b) / _FM_PHI
    c0 = sum(
        (F.col(c).bitwiseAND(F.lit(1)) for c in scols), F.lit(0)
    ).cast("double")
    est = F.when(
        c0 < float(n_sketches),
        F.log(1.0 - c0 / float(n_sketches)) / F.log(F.lit(0.5)),
    ).otherwise(fm)
    snaps.append(sk.select("id", F.lit(0).alias("t"), est.alias("ball")))
    for t in range(1, max_t + 1):
        contrib = e.join(sk, e.dst == sk.id).select(
            F.col("src").alias("id"), *scols
        )
        sk = (
            sk.unionByName(contrib)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(c) for c in scols])
            .localCheckpoint()
        )
        snaps.append(
            sk.select("id", F.lit(t).alias("t"), est.alias("ball"))
        )
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out


def harmonic_centrality(
    edges: DataFrame,
    max_t: int = 8,
    method: str = "sketch",
    n_sketches: int = 32,
    seed: int = 17,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """HyperBall harmonic centrality → (id, centrality):
    h(v) = Σ_{u≠v, d(v,u)≤max_t} 1 / d(v, u), estimated from ball
    growth: Σ_t (|B(v,t)| − |B(v,t−1)|) / t (Boldi & Vigna,
    "In-Core Computation of Geometric Centralities with HyperBall").
    The centrality that, unlike closeness, handles disconnected
    graphs gracefully — unreached vertices simply contribute 0.

    Distances run FROM v along edge direction; pass reversed edges
    for the "how centrally reachable is v" variant (the paper's
    convention). Ball deltas are clamped at 0 so the FM→linear-count
    estimator switchover can never subtract mass. Plan: the
    distance_profile loop + one (id) hash agg over max_t+1 snapshot
    rows per vertex.
    """
    prof = distance_profile(
        edges,
        max_t=max_t,
        method=method,
        n_sketches=n_sketches,
        seed=seed,
        src_col=src_col,
        dst_col=dst_col,
        directed=directed,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("t")
    delta = F.greatest(
        F.col("ball") - F.lag("ball", 1).over(w), F.lit(0.0)
    )
    return (
        prof.select(
            "id",
            "t",
            F.when(F.col("t") > 0, delta / F.col("t"))
            .otherwise(F.lit(0.0))
            .alias("contrib"),
        )
        .groupBy("id")
        .agg(F.sum("contrib").alias("centrality"))
    )


def shortest_path_counts(
    edges: DataFrame,
    sources: DataFrame | list[int],
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Number of shortest paths from each source → (source, id, hop,
    sigma): hop = d(source, id), sigma = σ_s(v) = how many distinct
    shortest paths realize it. The forward half of Brandes'
    betweenness algorithm, exposed as its own operator (σ is also the
    "path diversity" feature KG curation uses — σ=1 means a single
    fragile evidence chain).

    Level-synchronous frontier expansion like `bfs_distances`, with
    one extra map-side-combining SUM: σ(v, d) = Σ σ(u, d−1) over
    predecessors u — the anti-join against settled vertices makes
    "first reach = shortest" hold, so the per-level aggregate is all
    the bookkeeping σ needs. Exact integer counts (cross-engine
    oracle-able); σ can grow exponentially with depth, which is one
    more reason `max_hops` is part of the contract.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    if isinstance(sources, DataFrame):
        lm = sources.select(
            F.col(sources.columns[0]).cast("long").alias("source")
        ).distinct()
    else:
        lm = edges.sparkSession.createDataFrame(
            [(int(x),) for x in sources], "source long"
        )
    done = lm.select(
        "source",
        F.col("source").alias("id"),
        F.lit(0).cast("int").alias("hop"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint()
    frontier = done
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select("source", F.col("dst").alias("id"), "sigma")
            .join(
                done.select("source", "id"), ["source", "id"], "left_anti"
            )
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .select(
                "source",
                "id",
                F.lit(d).cast("int").alias("hop"),
                "sigma",
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        done = done.unionByName(nxt)
        frontier = nxt
    return done


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame | list[int],
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Brandes betweenness from sampled sources → (id, betweenness):
    C_B(v) = Σ_s δ_s(v) where δ_s(v) = Σ_{w: v→w on a shortest path}
    (σ(v)/σ(w)) · (1 + δ_s(w)) — the bridge-entity detector (an
    over-merged canonical entity shows up as an absurdly-between
    vertex joining unrelated regions). Sampling sources is THE
    standard scale move (Brandes-Pich): exact betweenness is
    all-pairs; k sampled sources cost k bounded-BFS forward passes +
    k backward sweeps and estimate the same ranking — multiply by
    n/k for an unbiased magnitude estimate. Shortest paths longer
    than `max_hops` are ignored (hop-bounded betweenness; bound it
    or pay diameter rounds).

    Backward phase: per level one 3-way equi-join (level-d vertices →
    SP-DAG edges → level-d+1 deltas) + one (source, id) hash agg;
    per-round work ∝ the DAG slice, localCheckpoint lineage cuts;
    endpoints excluded per the standard definition.
    """
    spc = shortest_path_counts(
        edges, sources, max_hops=max_hops, src_col=src_col,
        dst_col=dst_col,
    ).localCheckpoint()
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("esrc"),
            F.col(dst_col).cast("long").alias("edst"),
        )
        .where(F.col("esrc") != F.col("edst"))
        .distinct()
        .localCheckpoint()
    )
    max_l = spc.agg(F.max("hop")).collect()[0][0]
    if max_l is None or max_l == 0:
        return spc.select("id").distinct().select(
            "id", F.lit(0.0).alias("betweenness")
        )
    delta = spc.where(F.col("hop") == max_l).select(
        "source", "id", F.lit(0.0).alias("delta")
    ).localCheckpoint()
    # deepest-level vertices never gain dependency but ARE part of the
    # result (betweenness 0) — unless they sit at hop 0 (max_l == 0
    # returns above)
    levels = [delta]
    # stop at level 1: sources (hop 0) are endpoints, never scored.
    # spc self-joins below get EXPLICIT renames — attribute refs from
    # a shared lineage resolve trivially-true on the join key
    for d in range(max_l - 1, 0, -1):
        cur = spc.where(F.col("hop") == d).select(
            F.col("source").alias("csource"),
            F.col("id").alias("cid"),
            "sigma",
        )
        nxt = (
            spc.where(F.col("hop") == d + 1)
            .select(
                F.col("source").alias("wsource"),
                F.col("id").alias("wid"),
                F.col("sigma").alias("wsigma"),
            )
            .join(
                delta.select(
                    F.col("source").alias("wsource"),
                    F.col("id").alias("wid"),
                    "delta",
                ),
                ["wsource", "wid"],
            )
        )
        contrib = (
            cur.join(e, F.col("cid") == F.col("esrc"))
            .join(
                nxt,
                (F.col("edst") == F.col("wid"))
                & (F.col("csource") == F.col("wsource")),
            )
            .select(
                F.col("csource").alias("source"),
                F.col("cid").alias("id"),
                (
                    F.col("sigma").cast("double")
                    / F.col("wsigma").cast("double")
                    * (1.0 + F.col("delta"))
                ).alias("c"),
            )
            .groupBy("source", "id")
            .agg(F.sum("c").alias("delta"))
        )
        delta = (
            cur.select(
                F.col("csource").alias("source"),
                F.col("cid").alias("id"),
            )
            .join(contrib, ["source", "id"], "left")
            .select(
                "source", "id", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )
            .localCheckpoint()
        )
        levels.append(delta)
    # sources (hop 0) are endpoints of their own paths — excluded
    out = None
    for lv in levels:
        out = lv if out is None else out.unionByName(lv)
    if out is None:
        return spc.select("id").distinct().select(
            "id", F.lit(0.0).alias("betweenness")
        )
    return out.groupBy("id").agg(F.sum("delta").alias("betweenness"))


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.0625,
    beta: float = 1.0,
    max_iter: int = 10,
    tol: float = 0.0,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Katz centrality → (id, katz): x = Σ_j α^j (Aᵀ)^j β·1 — every
    inbound walk contributes, damped α per hop. The centrality that
    (unlike PageRank) does not dilute a supporter's vote by its
    out-degree: an entity referenced by busy hubs still accumulates —
    the right notion for KG evidence where one source asserting many
    facts is not weaker evidence per fact.

    Power iteration x ← α·Aᵀx + β: per round one int64 equi-join +
    one map-side-combining sum + a left join back onto the vertex set
    (katz of in-degree-0 vertices is exactly β). tol=0 (default) runs
    exactly `max_iter` collect-FREE rounds — deterministic and
    oracle-able by unrolled SQL; tol>0 folds the L1 delta into one
    scalar collect per round (the pagerank discipline). Convergence
    requires α < 1/λ_max; the default 1/16 is an exact binary64
    dyadic, so pinned-round values over integer β are EXACT on every
    engine — no summation-order ulps at all.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    x = verts.select("id", F.lit(float(beta)).alias("katz"))
    for _ in range(max_iter):
        contrib = (
            e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("katz").alias("s"))
        )
        nxt = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    float(beta)
                    + float(alpha) * F.coalesce("s", F.lit(0.0))
                ).alias("katz"),
            )
            .localCheckpoint()
        )
        if tol > 0.0:
            d = (
                nxt.withColumnRenamed("katz", "new")
                .join(x.withColumnRenamed("katz", "old"), "id")
                .agg(F.sum(F.abs(F.col("new") - F.col("old"))))
                .collect()[0][0]
            )
            x = nxt
            if d is not None and d <= tol:
                break
        else:
            x = nxt
    return x


def assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity (Newman, "Assortative mixing in networks",
    PRL 2002) over the undirected simple view of `edges` → ONE row
    (m_edges, s_jk, s_j, s_jj, r).

    r is the Pearson correlation of endpoint degrees across edges:
    positive = hubs link to hubs (social-graph shape), negative = hubs
    link to leaves (star/hub shape — what an over-merged canonical
    entity looks like in a KG). Alongside `modularity` and
    `clustering_coefficient` it is the third one-number partition/
    topology gate for canonicalization output.

    Shape: dedupe to canonical (least, greatest) pairs, one degree
    hash agg, two int64 equi-joins to carry endpoint degrees, ONE
    final aggregate of pure-integer sums (Σjk, Σ(j+k), Σ(j²+k²)) —
    r is derived from those exact ints in a pinned expression order,
    so the binary64 result is bit-stable cross-engine. Degenerate
    variance (e.g. regular graphs) yields r = NULL, not a throw.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    joined = e.join(
        deg.select(F.col("id").alias("u"), F.col("deg").alias("dj")), "u"
    ).join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dk")), "v")
    sums = joined.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum(F.col("dj") * F.col("dk")).alias("s_jk"),
        F.sum(F.col("dj") + F.col("dk")).alias("s_j"),
        F.sum(
            F.col("dj") * F.col("dj") + F.col("dk") * F.col("dk")
        ).alias("s_jj"),
    )
    # pinned order: mu = s_j/(2m); r = (s_jk/m - mu^2)/(s_jj/(2m) - mu^2)
    mu = F.col("s_j").cast("double") / (F.lit(2.0) * F.col("m_edges"))
    num = F.col("s_jk").cast("double") / F.col("m_edges") - mu * mu
    den = F.col("s_jj").cast("double") / (
        F.lit(2.0) * F.col("m_edges")
    ) - mu * mu
    return sums.select(
        "m_edges",
        "s_jk",
        "s_j",
        "s_jj",
        F.when(den != 0.0, num / den).alias("r"),
    )
