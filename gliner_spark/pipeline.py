"""End-to-end KG-construction pipeline (the north-star dataflow).

transcripts ──► entities ──► (a) two-pass RE triples   [narrow, fused]
                        └──► (b) co-occurrence triples [bucketed equi-join]
entities ──► canonical map  [MinHash-LSH + connected components]
triples ⋈ canonical map ──► canonical triples ──► nodes + edges
every stage: lineage row + per-partition metrics; rerun resumes.

Stage DAG fingerprints chain, so flipping e.g. the relation list reruns
only the RE stage and everything downstream of it, while entities and the
canonical map are reused from their persisted outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .config import PipelineConfig, DEFAULT
from .operators.cooccur import induce_cooccurrence
from .operators.graph import build_edges, build_nodes
from .operators.linking import canonicalize, rewrite_triples
from .operators.ner import extract_entities
from .operators.relations import extract_triples
from .plans.lineage import StageRunner, fingerprint


@dataclass
class PipelineResult:
    entities: DataFrame
    triples: DataFrame
    cooccur: DataFrame
    canon_map: DataFrame
    canonical_triples: DataFrame
    nodes: DataFrame
    edges: DataFrame
    runner: StageRunner = field(repr=False, default=None)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    entity_types: list[str],
    relations: list[str],
    cfg: PipelineConfig | None = None,
    input_token: str = "unversioned-input",
) -> PipelineResult:
    """Run (or resume) the full pipeline, materializing every stage under
    out_dir. `input_token` identifies the input snapshot (path + version on
    a real lakehouse; any stable string here) — it roots the fingerprint
    chain, so a new input reruns everything."""
    cfg = cfg or DEFAULT
    runner = StageRunner(spark, out_dir)

    fp_ent = fingerprint("entities", input_token, cfg, entity_types)
    entities = runner.run_stage(
        "entities", fp_ent, lambda: extract_entities(transcripts, entity_types, cfg)
    )

    fp_tri = fingerprint("triples_re", fp_ent, relations)
    triples = runner.run_stage(
        "triples_re",
        fp_tri,
        lambda: extract_triples(transcripts, relations, entity_types, cfg),
    )

    fp_co = fingerprint("triples_cooccur", fp_ent, cfg.turn_window)
    cooccur = runner.run_stage(
        "triples_cooccur",
        fp_co,
        lambda: induce_cooccurrence(entities, cfg.turn_window),
    )

    fp_canon = fingerprint(
        "canon_map",
        fp_ent,
        cfg.minhash_perms,
        cfg.lsh_bands,
        cfg.shingle_size,
        cfg.jaccard_threshold,
        cfg.link_max_tokens,
    )
    # link NAME-like mentions only (≤ link_max_tokens tokens): longer span
    # surfaces keep themselves as canonical via rewrite_triples' coalesce
    from pyspark.sql import functions as F

    linkable = entities.where(
        F.col("tok_end") - F.col("tok_start") < cfg.link_max_tokens
    )
    canon_map = runner.run_stage(
        "canon_map",
        fp_canon,
        lambda: canonicalize(
            linkable,
            n_perms=cfg.minhash_perms,
            n_bands=cfg.lsh_bands,
            shingle_n=cfg.shingle_size,
            jaccard_threshold=cfg.jaccard_threshold,
        ),
    )

    fp_ct = fingerprint("triples_canonical", fp_tri, fp_canon)
    canonical_triples = runner.run_stage(
        "triples_canonical",
        fp_ct,
        lambda: rewrite_triples(triples, canon_map),
    )

    fp_nodes = fingerprint("nodes", fp_canon, fp_ct)
    nodes = runner.run_stage(
        "nodes", fp_nodes, lambda: build_nodes(canon_map, canonical_triples)
    )

    fp_edges = fingerprint("edges", fp_ct)
    edges = runner.run_stage(
        "edges", fp_edges, lambda: build_edges(canonical_triples)
    )

    return PipelineResult(
        entities=entities,
        triples=triples,
        cooccur=cooccur,
        canon_map=canon_map,
        canonical_triples=canonical_triples,
        nodes=nodes,
        edges=edges,
        runner=runner,
    )
