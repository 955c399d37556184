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


def build_nodes(canon_map: DataFrame) -> DataFrame:
    """canon_map(surface, entity_id, canonical, ent_type, n_mentions,
    entity_mentions) → nodes(entity_id, canonical, ent_type, n_mentions,
    n_surfaces)."""
    return canon_map.groupBy("entity_id", "canonical").agg(
        F.max(F.struct(F.col("n_mentions"), F.col("ent_type")))
        .getField("ent_type")
        .alias("ent_type"),
        F.sum("n_mentions").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_surfaces"),
    )


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
