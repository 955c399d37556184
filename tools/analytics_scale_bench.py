"""Batch-2 analytics operators at scale: interval join, funnel,
cohort retention, assortativity, and the spectral-embedding chain on
synthetic inputs two decimal orders above the driver-gate testdata.

Inputs (deterministic xxhash64 recipes, written once under _out/):
  * 20M events over 1M users / 30 days / 5 event types — drives
    temporal.interval_join (4M points x 4M intervals, 1h buckets),
    sessions.funnel (3-step), sessions.cohort_retention (daily);
  * the 2M-edge / 500k-vertex graph recipe shared with
    graph_scale_bench.py — drives graph.assortativity and the
    random_walks -> skipgram_pairs -> ppmi -> svd_embed(k=8) ->
    link_auc chain (AUC on a 100k-edge md5 sample: the Mann-Whitney
    sort is eval-sized by design).

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

N_EVENTS = int(os.environ.get("AN_EVENTS", 20_000_000))
N_USERS = int(os.environ.get("AN_USERS", 1_000_000))
N_EDGES = int(os.environ.get("AN_EDGES", 2_000_000))
N_VERTS = int(os.environ.get("AN_VERTS", 500_000))
SPAN_US = 30 * 86400 * 1_000_000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_out",
    "analytics_scale",
)


def main():
    from gliner_spark.operators.embeddings import (
        link_auc,
        ppmi,
        svd_embed,
    )
    from gliner_spark.operators.graph import (
        assortativity,
        random_walks,
        skipgram_pairs,
    )
    from gliner_spark.operators.sessions import cohort_retention, funnel
    from gliner_spark.operators.temporal import interval_join

    spark = build_session(
        app_name="analytics-scale", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)
    res = {"n_events": N_EVENTS, "n_users": N_USERS, "n_edges": N_EDGES}

    t0 = time.time()
    ev_path = os.path.join(OUT, "events")
    types = F.array(
        *[F.lit(s) for s in
          ("signup", "click", "purchase", "view", "error")]
    )
    spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64(F.lit("u"), "id"), F.lit(N_USERS)).alias(
            "user_id"
        ),
        F.element_at(
            types,
            (F.pmod(F.xxhash64(F.lit("t"), "id"), F.lit(5)) + 1).cast(
                "int"
            ),
        ).alias("event_type"),
        F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(SPAN_US)).alias("us"),
    ).repartition(64).write.parquet(ev_path)
    ev = spark.read.parquet(ev_path)
    res["synth_events_s"] = round(time.time() - t0, 1)

    # interval join: error points vs view intervals, 1h buckets
    t0 = time.time()
    pts = ev.where("event_type = 'error'").select(
        "event_id", "user_id", F.col("us").alias("pu")
    )
    iv = ev.where("event_type = 'view'").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.col("us").alias("su"),
        (
            F.col("us")
            + (F.pmod("event_id", F.lit(7)) + 1) * F.lit(3_600_000_000)
        ).alias("eu"),
    )
    n_ij = interval_join(
        pts, iv, "pu", "su", "eu",
        key_cols=("user_id",), value_cols=("iv_id",),
        bucket_us=3_600_000_000,
    ).count()
    res["interval_join_s"] = round(time.time() - t0, 1)
    res["interval_join_rows"] = n_ij

    # funnel: ts as timestamp built from us
    t0 = time.time()
    evt = ev.select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    stages = (
        funnel(evt, ("signup", "click", "purchase"))
        .groupBy("stage")
        .count()
        .collect()
    )
    res["funnel_s"] = round(time.time() - t0, 1)
    res["funnel_stages"] = {
        int(r["stage"]): int(r["count"]) for r in stages
    }

    t0 = time.time()
    coh = cohort_retention(evt).count()
    res["cohort_s"] = round(time.time() - t0, 1)
    res["cohort_cells"] = coh

    # graph recipe shared with graph_scale_bench.py
    t0 = time.time()
    g_path = os.path.join(OUT, "edges")
    spark.range(N_EDGES).select(
        F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(N_VERTS)).alias("src"),
        F.when(
            F.pmod(F.xxhash64(F.lit("m"), "id"), F.lit(10)) == 0,
            F.pmod(F.xxhash64(F.lit("h"), "id"), F.lit(1000)),
        )
        .otherwise(F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(N_VERTS)))
        .alias("dst"),
    ).repartition(64).write.parquet(g_path)
    g = spark.read.parquet(g_path)
    res["synth_graph_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    arow = assortativity(g).first()
    res["assortativity_s"] = round(time.time() - t0, 1)
    res["assortativity_r"] = (
        round(arow["r"], 6) if arow["r"] is not None else None
    )
    res["assort_m_edges"] = int(arow["m_edges"])

    # embedding chain: walks -> pairs -> ppmi -> svd(k=8) -> auc
    t0 = time.time()
    walks = random_walks(
        g, walk_len=4, walks_per_vertex=1, seed=7,
        src_col="src", dst_col="dst",
    )
    pairs = skipgram_pairs(walks, window=2)
    mat = ppmi(pairs).localCheckpoint()
    res["ppmi_rows"] = mat.count()
    res["ppmi_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    word, _ctx, sig = svd_embed(mat, k=8, iters=2, seed=7)
    word = word.localCheckpoint()
    res["svd_vectors"] = word.count()
    res["svd_s"] = round(time.time() - t0, 1)
    res["svd_sigma_top"] = round(max(sig), 2)

    t0 = time.time()
    sample = g.where(
        F.pmod(F.xxhash64(F.lit("auc"), "src", "dst"), F.lit(20)) == 0
    )
    auc_row = link_auc(sample, word, neg_per_pos=1, seed=13).first()
    res["auc_s"] = round(time.time() - t0, 1)
    res["auc"] = round(auc_row["auc"], 4)
    res["auc_pos"] = int(auc_row["n_pos"])
    res["auc_edges"] = int(auc_row["n_edges"])

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
