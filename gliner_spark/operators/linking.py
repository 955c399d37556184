"""Entity linking: MinHash-LSH blocking → similarity join → connected
components → canonical surface selection.

The reference has no linking stage (SURVEY §2.3 J-row "Entity linking
joins"); this implements the north-star spec with NATIVE DataFrame ops
end-to-end — no Python UDFs anywhere in this module:

 blocking   char-3-gram shingles of the normalized surface form →
            MinHash signatures (64 perms) → LSH bands (16 bands × 4 rows)
            → candidate pairs via equi-join on the band key;
 verify     exact Jaccard on the shingle sets (array_intersect/union) —
            LSH is only a blocker, the verified threshold decides;
 components large-star/small-star contraction over the verified
            similarity graph (driver-controlled O(log n) loop,
            localCheckpoint per round — Catalyst cannot iterate, SURVEY
            §4), with a single-task union-find finisher once the
            contracting edge set fits one task;
 canonical  per component: the surface with the highest mention count,
            ties broken by lexicographically greatest surface via struct
            max — deterministic, unlike bare max_by.

Scale notes:
 * Everything heavy runs on the DISTINCT-surface table, not mentions —
   cardinality drops by orders of magnitude at 10^12 turns.
 * MinHash = explode(shingles) → groupBy(surface) with 64 map-side-partial
   min aggregates over (a_p·h + b_p) mod p — one shuffle of shingle rows,
   all JVM-side. Classic a·x+b universal hashing over a Mersenne prime;
   base hash xxhash64 folded into [0, p) so the int64 multiply cannot
   overflow under ANSI mode.
 * LSH join is an equi-join on (band_idx, band_hash) — AQE-skew-splittable.
   Identical surfaces can't collide (input is distinct), so bucket blowup
   is bounded by genuinely-similar families.
 * Label propagation converges in O(diameter) rounds; similarity
   components are tiny cliques in practice, and `max_iter` bounds
   pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERSENNE = (1 << 31) - 1  # 2^31 - 1, prime


def _perm_coeffs(n_perms: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_p(x) = (a·x + b) mod p, a ≠ 0."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_perms)
    ]


def normalize_surface(col):
    """Normalization for blocking only (canonical output keeps the original
    surface): lowercase, collapse [-_ ] runs to single space, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"[-_\s]+", " "))


def shingle_set(col, n: int = 3):
    """Distinct char n-grams of a normalized surface, padded so short
    surfaces still produce ≥1 shingle."""
    padded = F.concat(F.lit(" "), normalize_surface(col), F.lit(" "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(padded) - n + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(padded, i, n))
    )


def surface_table(mentions: DataFrame, surface_col: str = "text") -> DataFrame:
    """mentions → distinct surfaces with mention counts, modal type, and a
    stable 64-bit `surface_id` = xxhash64(surface).

    One hash-agg shuffle on the surface string; count and the per-label
    counts fold map-side. All downstream joins/shuffles (banding, pair
    distinct, connected components) are keyed by the 8-byte id, not the
    string — at 10^12 turns the id keys cut shuffle volume by ~5-10×."""
    per_label = mentions.groupBy(
        F.col(surface_col).alias("surface"), F.col("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_label.groupBy("surface").agg(
        F.sum("n").alias("n_mentions"),
        # modal entity type, deterministic tie-break via struct ordering
        F.max(F.struct(F.col("n"), F.col("label"))).getField("label").alias(
            "ent_type"
        ),
    ).withColumn("surface_id", F.xxhash64("surface"))


def minhash_array(shingles_col, n_perms: int, seed: int):
    """MinHash signature as ONE map-side array expression over a shingle
    ARRAY column: base-hash each shingle once (folded to [0, p) so the
    ANSI int64 multiply cannot overflow), then per permutation
    array_min(transform(h → (a·h + b) mod p)).

    Identical values to the explode → 64-min-aggregates formulation, but
    ZERO shuffle and no 64-buffer aggregate: the r01 shape moved every
    (id, shingle) row through an exchange and paid a 64-column aggregate
    whose generated code dominated wall time at small scale; this is a
    narrow projection that pipelines with the scan at any scale."""
    coeffs = _perm_coeffs(n_perms, seed)
    hashes = F.transform(
        shingles_col,
        lambda s: F.pmod(F.xxhash64(F.lit(seed), s), F.lit(_MERSENNE)),
    )
    def perm_min(hs, a, b):
        return F.array_min(
            F.transform(
                hs, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))
            )
        )
    return hashes, coeffs, perm_min


def minhash_sig_expr(hs_col: str, n_perms: int, seed: int):
    """The n_perms-wide signature array as ONE parsed SQL expression over
    a pre-hashed shingle column `hs_col`: values identical to composing
    minhash_array's perm_min Columns (parity-pinned in test_linking), but
    built with a single JVM round-trip. Composing the per-perm Columns
    through py4j cost ~2 s of DRIVER wall per query at n_perms=64 —
    pure expression-construction overhead, paid before any task ran."""
    coeffs = _perm_coeffs(n_perms, seed)
    body = ",".join(
        f"array_min(transform({hs_col}, h -> "
        f"pmod(h * {a}L + {b}L, {_MERSENNE}L)))"
        for a, b in coeffs
    )
    return F.expr(f"array({body})")


def minhash_signatures(
    surfaces: DataFrame,
    n_perms: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """surfaces(surface[, surface_id], …) → (surface_id, surface,
    sig:array<bigint>[n_perms]). Pure map stage (see minhash_array)."""
    if "surface_id" not in surfaces.columns:
        surfaces = surfaces.withColumn("surface_id", F.xxhash64("surface"))
    hashes = F.transform(
        shingle_set(F.col("surface"), shingle_n),
        lambda s: F.pmod(F.xxhash64(F.lit(seed), s), F.lit(_MERSENNE)),
    )
    with_h = surfaces.select("surface_id", "surface", hashes.alias("_hs"))
    return with_h.select(
        "surface_id",
        "surface",
        minhash_sig_expr("_hs", n_perms, seed).alias("sig"),
    )


def lsh_bucket_pairs(
    banded: DataFrame,
    id_col: str = "surface_id",
    bucket_cols: tuple[str, str] = ("band", "band_hash"),
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """(id, bucket…) rows → distinct candidate pairs (id_a < id_b):
    bucket-capped equi self-join on the bucket key.

    The banded table is localCheckpointed once — the bucket-size filter
    and both self-join branches reuse the materialization instead of
    re-running the signature chain. Every shuffled row is int64s.

    `max_bucket_size` drops buckets above the cap before the join — the
    standard guard against the O(bucket²) blowup on low-entropy corpora
    (boilerplate / templated text). A dropped bucket only loses
    candidates that the OTHER bands can still propose; families larger
    than the cap are exactly the ones every band agrees on, so recall
    loss is confined to mega-clusters that downstream connected
    components would merge transitively anyway.

    (An intra-bucket pair-expansion variant — groupBy + nested array
    transforms — was A/B-tested here and lost by ~30% end-to-end: the
    codegen'd join emits pair rows faster than interpreted higher-order
    expressions expand them, and the checkpoint barrier it dropped was
    load-bearing for downstream consumers. Measured, not assumed.)"""
    bcols = list(bucket_cols)
    banded = banded.localCheckpoint()
    if max_bucket_size is not None:
        ok = (
            banded.groupBy(*bcols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .select(*bcols)
        )
        banded = banded.join(ok, on=bcols)
    a = banded.select(F.col(id_col).alias("id_a"), *bcols)
    b = banded.select(F.col(id_col).alias("id_b"), *bcols)
    return (
        a.join(b, on=bcols, how="inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def banded_signatures(
    with_sigs: DataFrame,
    n_bands: int,
    rows_per_band: int,
    id_col: str = "surface_id",
) -> DataFrame:
    """(id, sig) → (id, band, band_hash): one xxhash64 per band over its
    signature slice, exploded to a row per band. Pure map — the shared
    band-key construction for in-batch pairing (candidate_pairs) and the
    persisted-state probe (linking_incremental), so the two paths are
    bit-identical by construction."""
    return with_sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def candidate_pairs(
    with_sigs: DataFrame,
    n_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """LSH banding: equal band-slice hash in ANY band → candidate pair.

    Returns (id_a, id_b) with id_a < id_b, distinct, via the bucketed
    pair expansion (lsh_bucket_pairs). Every shuffled row is int64s —
    band rows, bucket lists, and the pair distinct move 8-byte ids,
    never surface strings.
    """
    banded = banded_signatures(with_sigs, n_bands, rows_per_band)
    return lsh_bucket_pairs(
        banded, "surface_id", ("band", "band_hash"), max_bucket_size
    )


def verified_pairs(
    pairs: DataFrame,
    surfaces: DataFrame,
    jaccard_threshold: float = 0.6,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard over shingle sets; keeps id pairs ≥ threshold.

    `pairs` is (id_a, id_b); two id-keyed equi-joins fetch the shingle
    arrays (and surface strings for downstream display); the intersect/
    union are array expressions, no extra shuffle beyond the joins.
    Output: (id_a, id_b, surface_a, surface_b, jaccard).
    """
    if "surface_id" not in surfaces.columns:
        surfaces = surfaces.withColumn("surface_id", F.xxhash64("surface"))
    sh = surfaces.select(
        "surface_id",
        "surface",
        shingle_set(F.col("surface"), shingle_n).alias("shingles"),
    )
    j = (
        pairs.join(
            sh.select(
                F.col("surface_id").alias("id_a"),
                F.col("surface").alias("surface_a"),
                F.col("shingles").alias("sh_a"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("surface_id").alias("id_b"),
                F.col("surface").alias("surface_b"),
                F.col("shingles").alias("sh_b"),
            ),
            "id_b",
        )
        # explicit-width repartition before the per-pair array math: the
        # joined rows are few MBs, so AQE's bytes-based coalescing would
        # evaluate the intersect/union expressions on ~1 core
        .repartition(pairs.sparkSession.sparkContext.defaultParallelism)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.where(F.col("jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "surface_a", "surface_b", "jaccard"
    )


def _local_membership(edges: DataFrame, id_col: str) -> DataFrame:
    """(u, v) edge set small enough for ONE task → (id, component) via
    union-find with min-id roots (union always attaches the larger root
    under the smaller, so by induction every root IS the minimum of its
    set — identical semantics to the star-contraction membership).

    Bounded by construction: callers gate on edge count (small_solve), so
    the single task holds ≤ small_solve edges plus the union-find dict —
    the same bounded-small-side pattern as the k-means centroid collect.
    One narrow exchange (coalesce, no shuffle write). Ids keep whatever
    orderable type the edges carry (int64 on the linking path)."""
    dt = edges.schema["u"].dataType.simpleString()
    schema = f"{id_col} {dt}, component {dt}"

    def run(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        if parent:
            ids = list(parent)
            yield pd.DataFrame(
                {id_col: ids, "component": [find(x) for x in ids]}
            )

    return edges.coalesce(1).mapInPandas(run, schema)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
    id_col: str = "id",
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    n_partitions: int | None = None,
    small_solve: int = 500_000,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) → (id, component) where component is the MIN id of the
    component. Ids may be any orderable type; int64 keys keep every
    iteration's shuffle at 16 bytes/row.

    Why not plain min-label propagation: that converges in O(diameter)
    rounds, and near-dup similarity graphs over templated text form LONG
    CHAINS (a~b~c~… with consecutive Jaccard above threshold), which made
    propagation pathologically slow at sf0.1. Star operations converge in
    O(log n) rounds regardless of diameter.

    Each round: large-star (every node links its larger neighbors to its
    current minimum neighbor) then small-star (links smaller-or-equal
    neighbors to the minimum), expressed as groupBy-min + re-expansion;
    localCheckpoint after each round truncates lineage (Catalyst cannot
    iterate, SURVEY §4). Convergence = edge multiset stable, checked by a
    cheap count+hash aggregate rather than a full self-join.

    small_solve: once the (contracting) edge multiset fits one task, the
    remaining rounds collapse into a single union-find pass
    (_local_membership) — star rounds here are pure scheduler overhead
    (~0.85 s/round of driver+stage latency on a 16 k-edge graph,
    measured), and convergence DETECTION alone costs two extra rounds.
    At 10^12-turn scale the star rounds still do the O(log n) heavy
    contraction; the finisher only replaces the tail where the graph is
    already tiny. 0 disables (pure star rounds).
    """
    ca, cb = edge_cols
    # work on (u, v) pairs ordered u < v; the "parent" relation converges
    # to star graphs centered at component minima
    e = (
        edges.select(
            F.least(ca, cb).alias("u"), F.greatest(ca, cb).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # right-size the LOOP state: the iteration repeats ~log(n) rounds, so
    # per-round fixed cost (task scheduling over empty partitions) is paid
    # many times — shrink small edge sets below the session's global
    # shuffle width. Checkpoint BEFORE counting: the count must not
    # evaluate the (possibly expensive) upstream edge chain once for
    # sizing and then again for materialization — lazy checkpoint + count
    # materializes exactly once, and the re-partition then shuffles only
    # the materialized (u, v) rows.
    e = e.localCheckpoint(eager=False)
    n_edges = e.count()

    def _attach(membership: DataFrame) -> DataFrame:
        return (
            vertices.select(id_col)
            .join(membership, id_col, "left")
            .select(
                id_col,
                F.coalesce("component", F.col(id_col)).alias("component"),
            )
        )

    if small_solve and n_edges <= small_solve:
        return _attach(_local_membership(e, id_col))
    if n_partitions is None:
        n_partitions = max(4, min(256, n_edges // 50_000 + 1))
    e = e.repartition(n_partitions, "u").localCheckpoint(eager=False)

    def _sig(df: DataFrame) -> tuple:
        # pmod keeps each term < 2^31 so the int64 sum cannot overflow
        # under ANSI mode for any realistic edge count (< ~4e9 rows)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(_MERSENNE))).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    def _large_star(ed: DataFrame) -> DataFrame:
        """For each node x: connect every strictly-larger neighbor to
        min(N(x) ∪ {x})."""
        nbrs = ed.select("u", "v").union(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        """For each node x: connect all smaller-or-equal neighbors (and x)
        to the minimum of those neighbors."""
        nbrs = ed.select("u", "v").union(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        grouped = (
            nbrs.where(F.col("v") < F.col("u"))
            .groupBy("u")
            .agg(F.collect_set("v").alias("vs"))
            .select("u", F.array_min("vs").alias("m"), F.explode("vs").alias("v"))
        )
        # emit (v, m) for v ≠ m, plus (u, m) exactly once (the v == m slot)
        return (
            grouped.select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("a"),
                F.col("m").alias("b"),
            )
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    sig = _sig(e)
    for _ in range(max_iter):
        # ONE job per round: the large-star intermediate stays lazy inside
        # the small-star plan (two shuffles fused), and the checkpoint is
        # LAZY — the signature aggregate both materializes it and checks
        # convergence, instead of paying a separate materialization job
        # (round cost here is scheduler-bound, not data-bound)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
        if small_solve and new_sig[0] <= small_solve:
            # contraction brought the graph under one task's budget —
            # the remaining O(log n) tail rounds are pure scheduler
            # latency; finish with a single union-find pass instead
            return _attach(_local_membership(e, id_col))

    # converged: every edge now points v → its component minimum u
    membership = e.select(
        F.col("v").alias(id_col), F.col("u").alias("component")
    ).groupBy(id_col).agg(F.min("component").alias("component"))
    return _attach(membership)


def canonicalize(
    mentions: DataFrame,
    surface_col: str = "text",
    n_perms: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.6,
    seed: int = 42,
    max_iter: int = 20,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """mentions → canonical-entity map:
    (surface, entity_id, canonical, ent_type, n_mentions).

    entity_id = xxhash64 of the canonical surface — stable across runs and
    cluster sizes."""
    rows_per_band = max(n_perms // n_bands, 1)
    # surfaces feeds four consumers (sigs, two shingle joins in verify,
    # the stats join) — materialize once instead of recomputing the
    # mention aggregation per branch
    surfaces = surface_table(mentions, surface_col).localCheckpoint()
    sigs = minhash_signatures(surfaces, n_perms, shingle_n, seed)
    pairs = candidate_pairs(sigs, n_bands, rows_per_band, max_bucket_size)
    verified = verified_pairs(pairs, surfaces, jaccard_threshold, shingle_n)
    comps = connected_components(
        surfaces.select(F.col("surface_id").alias("id")),
        verified.select("id_a", "id_b"),
        max_iter,
    )
    with_stats = comps.withColumnRenamed("id", "surface_id").join(
        surfaces, on="surface_id"
    )
    canon = with_stats.groupBy("component").agg(
        F.max(F.struct(F.col("n_mentions"), F.col("surface")))
        .getField("surface")
        .alias("canonical"),
        F.sum("n_mentions").alias("entity_mentions"),
        F.max(F.struct(F.col("n_mentions"), F.col("ent_type")))
        .getField("ent_type")
        .alias("entity_type"),
    )
    return (
        with_stats.join(canon, on="component")
        .select(
            "surface",
            F.xxhash64("canonical").alias("entity_id"),
            "canonical",
            F.col("entity_type").alias("ent_type"),
            F.col("n_mentions"),
            F.col("entity_mentions"),
        )
    )


def rewrite_triples(
    triples: DataFrame,
    canon_map: DataFrame,
    spark: SparkSession | None = None,
    broadcast_threshold: int = 10_000_000,
) -> DataFrame:
    """Rewrite triple subj/obj surfaces through the canonical map.

    The map is usually small relative to triples → broadcast both lookups
    (two broadcast hash joins, zero shuffle of the triple stream). Callers
    with giant maps pass broadcast_threshold=0 to fall back to sort-merge
    joins after an explicit repartition on the join key.
    """
    m = canon_map.select("surface", "entity_id", "canonical")
    use_broadcast = True
    if broadcast_threshold == 0:
        use_broadcast = False
    subj_map = m.select(
        F.col("surface").alias("subj"),
        F.col("entity_id").alias("subj_id"),
        F.col("canonical").alias("subj_canonical"),
    )
    obj_map = m.select(
        F.col("surface").alias("obj"),
        F.col("entity_id").alias("obj_id"),
        F.col("canonical").alias("obj_canonical"),
    )
    if use_broadcast:
        subj_map, obj_map = F.broadcast(subj_map), F.broadcast(obj_map)
    else:
        triples = triples.repartition("subj")
    out = triples.join(subj_map, on="subj", how="left").join(
        obj_map, on="obj", how="left"
    )
    # unlinked surfaces (no mention support) keep themselves as canonical
    return out.withColumn(
        "subj_canonical", F.coalesce("subj_canonical", "subj")
    ).withColumn(
        "obj_canonical", F.coalesce("obj_canonical", "obj")
    ).withColumn(
        "subj_id", F.coalesce("subj_id", F.xxhash64("subj"))
    ).withColumn(
        "obj_id", F.coalesce("obj_id", F.xxhash64("obj"))
    )
