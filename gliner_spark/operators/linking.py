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
 components iterative min-label propagation over the verified similarity
            graph (driver-controlled loop, localCheckpoint per iteration
            to cut lineage — Catalyst cannot iterate, SURVEY §4);
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
    """mentions → distinct surfaces with mention counts and modal type.

    One hash-agg shuffle on the surface string; count and the per-label
    counts fold map-side."""
    per_label = mentions.groupBy(
        F.col(surface_col).alias("surface"), F.col("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_label.groupBy("surface").agg(
        F.sum("n").alias("n_mentions"),
        # modal entity type, deterministic tie-break via struct ordering
        F.max(F.struct(F.col("n"), F.col("label"))).getField("label").alias(
            "ent_type"
        ),
    )


def minhash_signatures(
    surfaces: DataFrame,
    n_perms: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """surfaces(surface, …) → (surface, shingles, sig:array<bigint>[n_perms]).

    Fully native: explode distinct shingles → base hash folded to [0, p) →
    64 partial-aggregating min()s → reassembled signature array.
    """
    coeffs = _perm_coeffs(n_perms, seed)
    sh = surfaces.select(
        "surface", F.explode(shingle_set(F.col("surface"), shingle_n)).alias("sh")
    ).withColumn("h", F.pmod(F.xxhash64(F.lit(seed), F.col("sh")), F.lit(_MERSENNE)))
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(
            f"_s{p}"
        )
        for p, (a, b) in enumerate(coeffs)
    ]
    sigs = sh.groupBy("surface").agg(*aggs)
    sig_arr = F.array(*[F.col(f"_s{p}") for p in range(n_perms)])
    return sigs.select("surface", sig_arr.alias("sig"))


def candidate_pairs(
    with_sigs: DataFrame,
    n_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slice hash in ANY band → candidate pair.

    Returns (surface_a, surface_b) with surface_a < surface_b, distinct.
    The distinct() here shuffles only candidate pairs (small); the band
    join itself is equi on (band, band_hash).
    """
    banded = with_sigs.select(
        "surface",
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
    a = banded.select(
        F.col("surface").alias("surface_a"), "band", "band_hash"
    )
    b = banded.select(
        F.col("surface").alias("surface_b"), "band", "band_hash"
    )
    return (
        a.join(b, on=["band", "band_hash"], how="inner")
        .where(F.col("surface_a") < F.col("surface_b"))
        .select("surface_a", "surface_b")
        .distinct()
    )


def verified_pairs(
    pairs: DataFrame,
    surfaces: DataFrame,
    jaccard_threshold: float = 0.6,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard over shingle sets; keeps pairs ≥ threshold.

    Two equi-joins against the (small) surface table to fetch shingle
    arrays; intersection/union are array ops, no shuffle beyond the joins.
    """
    sh = surfaces.select(
        "surface", shingle_set(F.col("surface"), shingle_n).alias("shingles")
    )
    j = (
        pairs.join(
            sh.select(
                F.col("surface").alias("surface_a"),
                F.col("shingles").alias("sh_a"),
            ),
            "surface_a",
        )
        .join(
            sh.select(
                F.col("surface").alias("surface_b"),
                F.col("shingles").alias("sh_b"),
            ),
            "surface_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.where(F.col("jaccard") >= jaccard_threshold).select(
        "surface_a", "surface_b", "jaccard"
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation: vertices(surface) × edges(surface_a, surface_b)
    → (surface, component) where component is the MIN surface id (xxhash64
    of the min surface string) in the connected component.

    Driver-controlled loop; each iteration is join + union + min-agg;
    localCheckpoint truncates lineage so plans stay bounded (SURVEY §4).
    Converges in O(component diameter) ≤ max_iter rounds; similarity
    components are near-cliques so 3-4 rounds typically suffice.
    """
    sym = edges.select(
        F.col("surface_a").alias("src"), F.col("surface_b").alias("dst")
    ).union(
        edges.select(
            F.col("surface_b").alias("src"), F.col("surface_a").alias("dst")
        )
    )
    comp = vertices.select(
        F.col("surface"), F.col("surface").alias("component")
    ).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        msgs = sym.join(
            comp.withColumnRenamed("surface", "src"), on="src"
        ).select(F.col("dst").alias("surface"), "component")
        new_comp = (
            comp.unionByName(msgs)
            .groupBy("surface")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), on="surface")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp


def canonicalize(
    mentions: DataFrame,
    surface_col: str = "text",
    n_perms: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.6,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """mentions → canonical-entity map:
    (surface, entity_id, canonical, ent_type, n_mentions).

    entity_id = xxhash64 of the canonical surface — stable across runs and
    cluster sizes."""
    rows_per_band = max(n_perms // n_bands, 1)
    surfaces = surface_table(mentions, surface_col)
    sigs = minhash_signatures(surfaces, n_perms, shingle_n, seed)
    pairs = candidate_pairs(sigs, n_bands, rows_per_band)
    verified = verified_pairs(pairs, surfaces, jaccard_threshold, shingle_n)
    comps = connected_components(
        surfaces.select("surface"), verified, max_iter
    )
    with_stats = comps.join(surfaces, on="surface")
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
