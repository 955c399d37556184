"""Retrieval at scale: full-scan BM25 vs the persisted inverted index
on a 1M-document corpus — the sf0.1 documents table (5k rows) cannot
show the index earning its keep, because there a full scan is one task.

Reuses corpus_scale_bench.synth_docs (1M multi-line docs, 50k hash
vocabulary, pure native expressions — no driver data). Measures:

  * bm25_rank: the full-scan path — tokenizes EVERY doc and computes
    per-term tf map-side on every query (what you pay with no index);
  * build_bm25_index: pay-once postings build (sort+run-length tf,
    one bucket-repartition shuffle, partitioned write) + index bytes;
  * bm25_against_index: the query path — reads only the <=3 bucket
    directories the terms hash into, term predicate pushed to row
    groups; df recomputed from the read slice;
  * parity: identical (doc_id, score, rk) top-10 between the two paths
    (all top-10 docs match >= 1 term at this corpus size).

Query terms are drawn from the synth vocabulary (each appears in
roughly 48/50000 of docs, df ~ 1k at 1M — a realistic selective term)
plus one zero-df term. Prints ONE JSON line. Writes under _out/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gliner_spark.plans.session import build_session  # noqa: E402

N = int(os.environ.get("RETR_N", 1_000_000))
N_BUCKETS = int(os.environ.get("RETR_BUCKETS", 64))
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_out",
    "retrieval_scale",
)


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    from corpus_scale_bench import synth_docs

    from gliner_spark.operators.retrieval import (
        bm25_against_index,
        bm25_rank,
        build_bm25_index,
    )

    spark = build_session(app_name="retrieval-scale", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)
    docs_path = os.path.join(OUT, "docs")
    idx_path = os.path.join(OUT, "bm25_idx")

    t0 = time.time()
    synth_docs(spark, N).repartition(64).write.parquet(docs_path)
    synth_s = time.time() - t0
    docs = spark.read.parquet(docs_path)

    terms = ["w101", "w202", "quantumfoo"]

    # ---- full-scan path, twice (second run is the warm number: the
    # first pays one-off codegen/scan setup)
    scan_walls = []
    for _ in range(2):
        t0 = time.time()
        scan_rows = [
            (r["doc_id"], r["score"], r["rk"])
            for r in bm25_rank(docs, terms, top_k=10).collect()
        ]
        scan_walls.append(time.time() - t0)

    # ---- index build (pay once)
    t0 = time.time()
    meta = build_bm25_index(docs, idx_path, n_buckets=N_BUCKETS)
    build_s = time.time() - t0
    idx_bytes = _tree_bytes(idx_path)

    # ---- indexed query path, twice
    idx_walls = []
    for _ in range(2):
        t0 = time.time()
        idx_rows = [
            (r["doc_id"], r["score"], r["rk"])
            for r in bm25_against_index(
                spark, idx_path, terms, top_k=10
            ).collect()
        ]
        idx_walls.append(time.time() - t0)

    assert idx_rows == scan_rows, (idx_rows[:3], scan_rows[:3])

    print(
        json.dumps(
            {
                "n_docs": N,
                "n_buckets": N_BUCKETS,
                "synth_s": round(synth_s, 1),
                "scan_query_s": [round(w, 2) for w in scan_walls],
                "index_build_s": round(build_s, 1),
                "index_mb": round(idx_bytes / 1e6, 1),
                "indexed_query_s": [round(w, 2) for w in idx_walls],
                "speedup_warm": round(
                    min(scan_walls) / min(idx_walls), 2
                ),
                "postings_rows": meta
                and spark.read.parquet(idx_path).count(),
                "parity_top10": True,
            }
        )
    )


if __name__ == "__main__":
    main()
