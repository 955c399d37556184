"""Incremental entity canonicalization against persisted linking state —
the continuously-updating-KG shape of operators/linking.canonicalize.

The reference has no linking stage at all (SURVEY §2.3 J-row); batch
canonicalize implements the north-star spec. At 10^12 turns, though, a
KG is never built once: transcripts arrive in shards, and re-clustering
every surface ever seen per ingest is O(corpus) work for an O(shard)
change. This module persists the linking state ONCE and folds each new
shard in with work proportional to the shard plus the components it
touches:

 state      four bucketed tables (build_linking_state):
              {p}_surfaces (surface_id, surface, component, n_mentions,
                            ent_type)            bucketed on component
              {p}_labels   (component, surface, label, n)
                                                 bucketed on component
              {p}_bands    (band, band_hash, surface_id)
                                                 bucketed on band,band_hash
              {p}_canon    (component, canonical, entity_id,
                            entity_mentions, entity_type)
                                                 bucketed on component
            plus a one-row {p}_meta parameter record the increment READS
            instead of trusting its caller (mismatched n_perms/shingle_n
            would silently produce wrong candidates).
 probe      the shard's new surfaces are signed map-side (the same pure
            minhash/band expressions as batch — shared code, bit-equal)
            and equi-joined against {p}_bands; the state side is bucketed
            on the join key, so the corpus NEVER reshuffles — only the
            shard moves. Shard-internal pairs come from the same in-batch
            lsh_bucket_pairs as batch canonicalize.
 merge      connected components run on the MINI graph only: new surface
            ids + one anchor node per touched old component (old
            components are already transitively closed, so contracting
            each to its min-id anchor preserves connectivity exactly —
            the standard CC-maintenance argument). A new surface bridging
            two old entities MERGES them, exactly as a batch rerun would.
 canonical  recomputed only for touched components, from combined
            per-(surface, label) counts (state + shard) — so a shard that
            merely re-mentions a known surface can flip its component's
            canonical pick, again matching batch. Untouched components
            pass through as a bucketed scan + Exchange-free join, zero
            recompute.

Exactness: with max_bucket_size=None the output row set is IDENTICAL to
batch canonicalize over corpus ∪ shard (parity-pinned in
test_linking_incremental.py, including an entity-merge shard). Bucket
caps make candidates depend on bucket occupancy, so capped runs can
differ from a capped batch rerun near the cap boundary — same caveat as
every capped LSH path in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import write_bucketed
from .linking import (
    banded_signatures,
    candidate_pairs,
    connected_components,
    lsh_bucket_pairs,
    minhash_signatures,
    surface_table,
    verified_pairs,
)

_CANON_AGGS = (
    lambda: [
        F.max(F.struct(F.col("n_mentions"), F.col("surface")))
        .getField("surface")
        .alias("canonical"),
        F.sum("n_mentions").alias("entity_mentions"),
        F.max(F.struct(F.col("n_mentions"), F.col("ent_type")))
        .getField("ent_type")
        .alias("entity_type"),
    ]
)


def build_linking_state(
    mentions: DataFrame,
    table_prefix: str,
    path: str | None = None,
    surface_col: str = "text",
    n_perms: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.6,
    seed: int = 42,
    max_iter: int = 20,
    max_bucket_size: int | None = 1000,
    n_file_buckets: int = 8,
) -> None:
    """Run the batch linking chain once and persist its state (see module
    docstring for the table layout). Same primitives as canonicalize —
    signatures, candidates, verify, CC — so state contents are bit-equal
    to what a batch run computes internally."""
    rows_per_band = max(n_perms // n_bands, 1)
    surfaces = surface_table(mentions, surface_col).localCheckpoint()
    sigs = minhash_signatures(surfaces, n_perms, shingle_n, seed)
    pairs = candidate_pairs(sigs, n_bands, rows_per_band, max_bucket_size)
    verified = verified_pairs(pairs, surfaces, jaccard_threshold, shingle_n)
    comps = connected_components(
        surfaces.select(F.col("surface_id").alias("id")),
        verified.select("id_a", "id_b"),
        max_iter,
    )
    members = (
        comps.withColumnRenamed("id", "surface_id")
        .join(surfaces, "surface_id")
        .localCheckpoint()
    )
    p = table_prefix
    write_bucketed(
        members.select(
            "surface_id", "surface", "component", "n_mentions", "ent_type"
        ),
        f"{p}_surfaces",
        ["component"],
        n_file_buckets,
        f"{path}/surfaces" if path else None,
    )
    labels = mentions.groupBy(
        F.col(surface_col).alias("surface"), F.col("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    write_bucketed(
        labels.join(
            members.select("surface", "component"), "surface"
        ).select("component", "surface", "label", "n"),
        f"{p}_labels",
        ["component"],
        n_file_buckets,
        f"{path}/labels" if path else None,
    )
    write_bucketed(
        banded_signatures(sigs, n_bands, rows_per_band).select(
            "band", "band_hash", "surface_id"
        ),
        f"{p}_bands",
        ["band", "band_hash"],
        n_file_buckets,
        f"{path}/bands" if path else None,
    )
    canon = members.groupBy("component").agg(*_CANON_AGGS())
    write_bucketed(
        canon.withColumn("entity_id", F.xxhash64("canonical")),
        f"{p}_canon",
        ["component"],
        n_file_buckets,
        f"{path}/canon" if path else None,
    )
    meta = mentions.sparkSession.createDataFrame(
        [(n_perms, n_bands, shingle_n, float(jaccard_threshold), seed)],
        "n_perms int, n_bands int, shingle_n int,"
        " jaccard_threshold double, seed int",
    )
    writer = meta.coalesce(1).write.mode("overwrite")
    if path:
        writer = writer.option("path", f"{path}/meta")
    writer.saveAsTable(f"{p}_meta")


def canonical_map_from_state(
    spark: SparkSession, table_prefix: str
) -> DataFrame:
    """State → the batch canonicalize output shape
    (surface, entity_id, canonical, ent_type, n_mentions,
    entity_mentions). One Exchange-free bucketed join."""
    p = table_prefix
    return (
        spark.table(f"{p}_surfaces")
        .join(spark.table(f"{p}_canon"), "component")
        .select(
            "surface",
            "entity_id",
            "canonical",
            F.col("entity_type").alias("ent_type"),
            "n_mentions",
            "entity_mentions",
        )
    )


def canonicalize_increment(
    new_mentions: DataFrame,
    table_prefix: str,
    surface_col: str = "text",
    max_iter: int = 20,
    max_bucket_size: int | None = 1000,
    out_prefix: str | None = None,
    out_path: str | None = None,
    n_file_buckets: int = 8,
) -> DataFrame:
    """Fold a shard of new mentions into persisted linking state and
    return the UPDATED full canonical map (batch-output schema).

    Work scales with the shard, not the corpus: the corpus side of every
    join is either bucketed on the join key (bands probe, untouched
    pass-through) or pre-filtered by a broadcast of shard-derived keys
    (member fetch for touched components) — the only full-corpus reads
    are bucketed scans, never shuffles. See module docstring for the
    algorithm and its batch-parity argument.

    With `out_prefix`, the UPDATED state is persisted too (generation
    rotation — a NEW prefix, never in-place: Spark cannot safely
    overwrite tables it is reading), so increments CHAIN: the next shard
    probes `out_prefix` and sees this one folded in. Untouched rows copy
    through as bucketed scans; bands append; only the touched scope is
    recomputed — chained-parity is pinned in tests.
    """
    spark = new_mentions.sparkSession
    p = table_prefix
    if out_prefix == table_prefix:
        raise ValueError(
            "out_prefix must differ from table_prefix: overwriting state "
            "tables while reading them is undefined in Spark — rotate "
            "generations (e.g. suffix a version number) instead"
        )
    meta = spark.table(f"{p}_meta").collect()[0]
    n_perms, n_bands = meta["n_perms"], meta["n_bands"]
    shingle_n, seed = meta["shingle_n"], meta["seed"]
    threshold = meta["jaccard_threshold"]
    rows_per_band = max(n_perms // n_bands, 1)
    state_surf = spark.table(f"{p}_surfaces")
    state_canon = spark.table(f"{p}_canon")
    state_labels = spark.table(f"{p}_labels")
    state_bands = spark.table(f"{p}_bands")

    shard_labels = new_mentions.groupBy(
        F.col(surface_col).alias("surface"), F.col("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    shard_surf = (
        shard_labels.groupBy("surface")
        .agg(F.sum("n").alias("_n_new"))
        .withColumn("surface_id", F.xxhash64("surface"))
        .localCheckpoint()
    )

    # ---- known / new split. Both joins keep the corpus map-side: the
    # shard (small by construction of incremental ingest) broadcasts
    # into the corpus scan, and the resulting `known` set is
    # shard-bounded, so IT broadcasts into the anti-join.
    known = (
        state_surf.join(
            F.broadcast(shard_surf.select("surface")), "surface", "leftsemi"
        )
        .select("surface", "component")
        .localCheckpoint()
    )
    new_surf = (
        shard_surf.join(
            F.broadcast(known.select("surface")), "surface", "left_anti"
        )
        .select("surface_id", "surface")
        .localCheckpoint()
    )

    # ---- candidate edges for the new surfaces
    new_sigs = minhash_signatures(new_surf, n_perms, shingle_n, seed)
    new_bands = banded_signatures(new_sigs, n_bands, rows_per_band)
    nn_pairs = lsh_bucket_pairs(
        new_bands, "surface_id", ("band", "band_hash"), max_bucket_size
    )
    no_cand = (
        new_bands.select(
            F.col("surface_id").alias("new_id"), "band", "band_hash"
        )
        .join(
            state_bands.select(
                F.col("surface_id").alias("old_id"), "band", "band_hash"
            ),
            ["band", "band_hash"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    # candidate old surfaces are shard-bounded → broadcast-filter the
    # corpus scan instead of joining the corpus to anything big
    old_cand_surf = state_surf.join(
        F.broadcast(
            no_cand.select(F.col("old_id").alias("surface_id")).distinct()
        ),
        "surface_id",
    ).localCheckpoint()

    # ---- exact-Jaccard verify (same verifier as batch)
    nn_ver = verified_pairs(nn_pairs, new_surf, threshold, shingle_n)
    both_surf = new_surf.unionByName(
        old_cand_surf.select("surface_id", "surface")
    )
    no_ver = verified_pairs(
        no_cand.select(
            F.col("new_id").alias("id_a"), F.col("old_id").alias("id_b")
        ),
        both_surf,
        threshold,
        shingle_n,
    )

    # ---- mini graph: new surfaces + one anchor per touched old
    # component (old components are transitively closed, so contracting
    # each to its anchor preserves connectivity exactly)
    no_edges = (
        no_ver.select("id_a", "id_b")
        .join(
            old_cand_surf.select(
                F.col("surface_id").alias("id_b"), "component"
            ),
            "id_b",
        )
        .select("id_a", F.col("component").alias("id_b"))
        .distinct()
    )
    anchors = no_edges.select(F.col("id_b").alias("id")).distinct()
    nodes = (
        new_surf.select(F.col("surface_id").alias("id"))
        .unionByName(anchors)
        .distinct()
    )
    edges = nn_ver.select("id_a", "id_b").unionByName(no_edges)
    mini = connected_components(nodes, edges, max_iter).localCheckpoint()

    # ---- touched old components: structurally linked ones plus every
    # component whose mention counts the shard changed (known surfaces) —
    # a count bump alone can flip the canonical pick, as in batch
    touched = (
        anchors.select(F.col("id").alias("component"))
        .unionByName(known.select("component"))
        .distinct()
        .localCheckpoint()
    )

    # final component key per member of the recompute scope
    remap = mini.join(anchors, "id").select(
        F.col("id").alias("component"), F.col("component").alias("final_comp")
    )
    old_final = (
        state_surf.join(F.broadcast(touched), "component")
        .join(F.broadcast(remap), "component", "left")
        .withColumn("final_comp", F.coalesce("final_comp", F.col("component")))
        .select("surface_id", "final_comp")
    )
    new_final = mini.join(
        new_surf.select(F.col("surface_id").alias("id")), "id"
    ).select(
        F.col("id").alias("surface_id"), F.col("component").alias("final_comp")
    )
    assign = old_final.unionByName(new_final)

    # ---- combined per-surface stats over the recompute scope only
    comb = (
        state_labels.join(F.broadcast(touched), "component")
        .select("surface", "label", "n")
        .unionByName(shard_labels)
        .groupBy("surface", "label")
        .agg(F.sum("n").alias("n"))
    )
    comb_surf = (
        comb.groupBy("surface")
        .agg(
            F.sum("n").alias("n_mentions"),
            F.max(F.struct(F.col("n"), F.col("label")))
            .getField("label")
            .alias("ent_type"),
        )
        .withColumn("surface_id", F.xxhash64("surface"))
    )
    touched_stats = comb_surf.join(assign, "surface_id")
    if out_prefix is not None:
        # feeds the returned map AND three state writes — materialize once
        touched_stats = touched_stats.localCheckpoint()
    canon2 = touched_stats.groupBy("final_comp").agg(*_CANON_AGGS())
    touched_rows = touched_stats.join(canon2, "final_comp").select(
        "surface",
        F.xxhash64("canonical").alias("entity_id"),
        "canonical",
        F.col("entity_type").alias("ent_type"),
        "n_mentions",
        "entity_mentions",
    )

    # ---- untouched components pass through: bucketed scan + bucketed
    # join on component, zero recompute, zero Exchange
    untouched = (
        state_surf.join(F.broadcast(touched), "component", "left_anti")
        .join(state_canon, "component")
        .select(
            "surface",
            "entity_id",
            "canonical",
            F.col("entity_type").alias("ent_type"),
            "n_mentions",
            "entity_mentions",
        )
    )

    if out_prefix is not None:
        q = out_prefix
        write_bucketed(
            state_surf.join(F.broadcast(touched), "component", "left_anti")
            .select(
                "surface_id", "surface", "component", "n_mentions", "ent_type"
            )
            .unionByName(
                touched_stats.select(
                    "surface_id",
                    "surface",
                    F.col("final_comp").alias("component"),
                    "n_mentions",
                    "ent_type",
                )
            ),
            f"{q}_surfaces",
            ["component"],
            n_file_buckets,
            f"{out_path}/surfaces" if out_path else None,
        )
        write_bucketed(
            state_labels.join(F.broadcast(touched), "component", "left_anti")
            .select("component", "surface", "label", "n")
            .unionByName(
                comb.withColumn("surface_id", F.xxhash64("surface"))
                .join(assign, "surface_id")
                .select(
                    F.col("final_comp").alias("component"),
                    "surface",
                    "label",
                    "n",
                )
            ),
            f"{q}_labels",
            ["component"],
            n_file_buckets,
            f"{out_path}/labels" if out_path else None,
        )
        write_bucketed(
            state_bands.select("band", "band_hash", "surface_id").unionByName(
                new_bands.select("band", "band_hash", "surface_id")
            ),
            f"{q}_bands",
            ["band", "band_hash"],
            n_file_buckets,
            f"{out_path}/bands" if out_path else None,
        )
        write_bucketed(
            state_canon.join(F.broadcast(touched), "component", "left_anti")
            .select(
                "component",
                "canonical",
                "entity_mentions",
                "entity_type",
                "entity_id",
            )
            .unionByName(
                canon2.select(
                    F.col("final_comp").alias("component"),
                    "canonical",
                    "entity_mentions",
                    "entity_type",
                ).withColumn("entity_id", F.xxhash64("canonical"))
            ),
            f"{q}_canon",
            ["component"],
            n_file_buckets,
            f"{out_path}/canon" if out_path else None,
        )
        writer = (
            spark.table(f"{p}_meta").coalesce(1).write.mode("overwrite")
        )
        if out_path:
            writer = writer.option("path", f"{out_path}/meta")
        writer.saveAsTable(f"{q}_meta")

    return untouched.unionByName(touched_rows)
