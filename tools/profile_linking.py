"""Stage-level wall profile of the bench `linking` query at sf0.1.

Reproduces bench.py's q_linking setup (same transcripts, same name-like
filter), then times each pipeline stage with an explicit materialization
barrier so the numbers attribute wall time to stages, not to lazy chains:

  surfaces → signatures → banding+bucket pairs → Jaccard verify →
  connected components (per-round timing) → canonical aggregation.

Usage: python tools/profile_linking.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gliner_spark.plans.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(f"local[{cpus}]", shuffle_partitions=cpus)

    from pyspark.sql import functions as F

    from gliner_spark.operators import linking as L
    from gliner_spark.operators.ner import extract_entities
    from gliner_spark.sources.transcripts import synth_transcripts

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_convs = max(int(10_000 * sf), 20)
    transcripts = synth_transcripts(spark, n_convs).repartition(cpus).cache()
    transcripts.count()

    ENTITY_TYPES = [
        "person", "organization", "location", "product", "date", "tool",
    ]
    ents = extract_entities(transcripts, ENTITY_TYPES).cache()
    ents.count()
    names = ents.where("tok_end - tok_start <= 2")

    t: dict[str, float] = {}

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = time.perf_counter() - t0
        print(f"[profile] {name}: {t[name]:.3f}s", flush=True)
        return out

    # 1. surface table (localCheckpoint barrier, as canonicalize does)
    surfaces = stage(
        "surface_table", lambda: L.surface_table(names, "text").localCheckpoint()
    )
    print(f"  surfaces: {surfaces.count()}")

    # 2. minhash signatures (pure map — materialize via checkpoint)
    sigs = stage(
        "minhash_signatures",
        lambda: L.minhash_signatures(surfaces, 64, 3, 42).localCheckpoint(),
    )

    # 3. LSH banding + bucket pairs
    pairs = stage(
        "candidate_pairs",
        lambda: L.candidate_pairs(sigs, 16, 4, 1000).localCheckpoint(),
    )
    print(f"  candidate pairs: {pairs.count()}")

    # 4. exact-Jaccard verify
    verified = stage(
        "verified_pairs",
        lambda: L.verified_pairs(pairs, surfaces, 0.5, 3)
        .select("id_a", "id_b")
        .localCheckpoint(),
    )
    print(f"  verified pairs: {verified.count()}")

    # 5. connected components, instrumented per round
    t0 = time.perf_counter()
    comps = L.connected_components(
        surfaces.select(F.col("surface_id").alias("id")), verified
    )
    comps_rows = comps.count()
    t["connected_components"] = time.perf_counter() - t0
    print(
        f"[profile] connected_components: {t['connected_components']:.3f}s "
        f"({comps_rows} rows)",
        flush=True,
    )

    # 6. canonical aggregation + final joins (rest of canonicalize)
    def canon_tail():
        with_stats = comps.withColumnRenamed("id", "surface_id").join(
            surfaces, on="surface_id"
        )
        canon = with_stats.groupBy("component").agg(
            F.max(F.struct(F.col("n_mentions"), F.col("surface")))
            .getField("surface")
            .alias("canonical"),
        )
        return with_stats.join(canon, on="component").count()

    stage("canonical_tail", canon_tail)

    # full operator for comparison (fresh, end-to-end like the bench)
    stage(
        "FULL canonicalize",
        lambda: L.canonicalize(names, jaccard_threshold=0.5).count(),
    )

    total = sum(v for k, v in t.items() if not k.startswith("FULL"))
    print(f"[profile] staged total: {total:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
