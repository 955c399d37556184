"""Graph analytics at scale, part 2: the r4-continuation operators on
the SAME synthetic 2M-edge / 500k-vertex hubby graph as
graph_scale_bench.py (identical xxhash64 recipe, so numbers are
comparable across the two scripts).

Measured, `local[32]`:
  * neighborhood_function, sketch mode (ANF: 32 FM int64 masks per
    vertex, one bit_or agg per round), max_t=5 — plus the
    effective_diameter readout;
  * harmonic_centrality, sketch mode, max_t=5 (the HyperBall
    application: same loop + one window/agg);
  * clustering_coefficient (triangle_counts + degree agg + join);
  * modularity of the 3-round LPA partition;
  * shortest_path_counts from 3 sources, max_hops=3 (Brandes forward
    σ pass), then full betweenness_centrality (backward sweeps);
  * katz_centrality, 3 collect-free rounds.

Prints ONE JSON line. Writes under _out/ (gitignored).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gliner_spark.plans.session import build_session  # noqa: E402

N_EDGES = int(os.environ.get("GRAPH_E", 2_000_000))
N_VERTS = int(os.environ.get("GRAPH_V", 500_000))
N_HUBS = 1000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_out",
    "graph_scale2",
)


def main():
    from gliner_spark.operators.graph import (
        betweenness_centrality,
        effective_diameter,
        harmonic_centrality,
        katz_centrality,
        label_propagation,
        modularity,
        neighborhood_function,
        shortest_path_counts,
    )
    from gliner_spark.operators.motif import clustering_coefficient

    spark = build_session(app_name="graph-scale2", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)
    path = os.path.join(OUT, "edges")

    t0 = time.time()
    spark.range(N_EDGES).select(
        F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(N_VERTS)).alias(
            "subj_id"
        ),
        F.when(
            F.pmod(F.xxhash64(F.lit("m"), "id"), F.lit(10)) == 0,
            F.pmod(F.xxhash64(F.lit("h"), "id"), F.lit(N_HUBS)),
        )
        .otherwise(
            F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(N_VERTS))
        )
        .alias("obj_id"),
    ).repartition(64).write.parquet(path)
    synth_s = time.time() - t0
    e = spark.read.parquet(path)

    t0 = time.time()
    nf = neighborhood_function(
        e, max_t=5, method="sketch", n_sketches=32,
        src_col="subj_id", dst_col="obj_id",
    ).localCheckpoint()
    eff_d = effective_diameter(nf, q=0.9)
    nf_rows = {r["t"]: r["n_pairs"] for r in nf.collect()}
    anf_s = time.time() - t0

    t0 = time.time()
    hc = harmonic_centrality(
        e, max_t=5, method="sketch", n_sketches=32,
        src_col="subj_id", dst_col="obj_id",
    )
    hc_row = hc.agg(
        F.count(F.lit(1)).alias("nv"), F.max("centrality").alias("mx")
    ).collect()[0]
    harm_s = time.time() - t0

    t0 = time.time()
    cc = clustering_coefficient(
        e, src_col="subj_id", dst_col="obj_id"
    )
    cc_row = cc.agg(
        F.count(F.lit(1)).alias("nv"),
        F.round(F.avg("coefficient"), 6).alias("avg"),
    ).collect()[0]
    clust_s = time.time() - t0

    t0 = time.time()
    lpa = label_propagation(
        e, max_iter=3, src_col="subj_id", dst_col="obj_id"
    ).localCheckpoint()
    mq = modularity(e, lpa, src_col="subj_id", dst_col="obj_id")
    q_total = mq.agg(F.sum("contribution")).collect()[0][0]
    mod_s = time.time() - t0

    t0 = time.time()
    spc = shortest_path_counts(
        e, [0, 1, 2], max_hops=3, src_col="subj_id", dst_col="obj_id"
    )
    spc_rows = spc.count()
    sigma_s = time.time() - t0

    t0 = time.time()
    bc = betweenness_centrality(
        e, [0, 1, 2], max_hops=3, src_col="subj_id", dst_col="obj_id"
    )
    bc_row = bc.agg(
        F.count(F.lit(1)).alias("nv"),
        F.round(F.max("betweenness"), 2).alias("mx"),
    ).collect()[0]
    btw_s = time.time() - t0

    t0 = time.time()
    kz = katz_centrality(
        e, alpha=0.0625, max_iter=3, src_col="subj_id",
        dst_col="obj_id",
    )
    kz_row = kz.agg(
        F.count(F.lit(1)).alias("nv"),
        F.round(F.max("katz"), 4).alias("mx"),
    ).collect()[0]
    katz_s = time.time() - t0

    print(
        json.dumps(
            {
                "n_edges": N_EDGES,
                "n_verts": N_VERTS,
                "synth_s": round(synth_s, 1),
                "anf5_sketch_s": round(anf_s, 1),
                "anf_nf": {str(t): round(v) for t, v in nf_rows.items()},
                "effective_diameter_q90": round(eff_d, 2),
                "harmonic5_sketch_s": round(harm_s, 1),
                "harmonic_verts": int(hc_row["nv"]),
                "harmonic_max": round(float(hc_row["mx"]), 1),
                "clustering_s": round(clust_s, 1),
                "clustering_verts": int(cc_row["nv"]),
                "clustering_avg": float(cc_row["avg"]),
                "lpa_plus_modularity_s": round(mod_s, 1),
                "modularity_q": round(float(q_total), 6),
                "sigma3_s": round(sigma_s, 1),
                "sigma_rows": int(spc_rows),
                "betweenness3_s": round(btw_s, 1),
                "betweenness_verts": int(bc_row["nv"]),
                "betweenness_max": float(bc_row["mx"]),
                "katz3_s": round(katz_s, 1),
                "katz_verts": int(kz_row["nv"]),
                "katz_max": float(kz_row["mx"]),
            }
        )
    )


if __name__ == "__main__":
    main()
