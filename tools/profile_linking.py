"""Stage-by-stage wall-clock profile of the entity-linking path at a given
conv count. Usage: python tools/profile_linking.py [n_convs]"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gliner_spark.operators.linking import (  # noqa: E402
    candidate_pairs,
    connected_components,
    minhash_signatures,
    surface_table,
    verified_pairs,
)
from gliner_spark.operators.ner import extract_entities  # noqa: E402
from gliner_spark.plans.session import build_session  # noqa: E402
from gliner_spark.sources.transcripts import synth_transcripts  # noqa: E402

ENT = ["person", "organization", "location", "service", "tool"]


def tick(name, f):
    t0 = time.time()
    r = f()
    print(f"{name}: {time.time() - t0:.1f}s -> {r}", flush=True)
    return r


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    spark = build_session(
        app_name="prof-linking", master="local[32]", shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = synth_transcripts(spark, n_convs).repartition(128).cache()
    t.count()
    ents = extract_entities(t, ENT).cache()
    tick("extract", ents.count)
    surfaces = surface_table(ents).cache()
    tick("surfaces", surfaces.count)
    sigs = minhash_signatures(surfaces).cache()
    tick("minhash", sigs.count)
    pairs = candidate_pairs(sigs).cache()
    tick("cand_pairs", pairs.count)
    ver = verified_pairs(pairs, surfaces, 0.5).cache()
    tick("verified", ver.count)
    comps = connected_components(surfaces.select("surface"), ver)
    tick("components", comps.count)
    tick("n_components", comps.select("component").distinct().count)
    spark.stop()


if __name__ == "__main__":
    main()
