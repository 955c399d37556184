"""Streaming inverted-index maintenance: fold each micro-batch of new
documents into a persisted BM25 index (operators/retrieval) — the
live-ingest side of corpus search, the retrieval twin of
streaming/linking.py's canonicalization folds.

Exactly-once under Structured Streaming's batch replay, with
crash-safe commits, WITHOUT rewriting the index per batch (the
generation-rotation trick linking uses would mean re-copying every
posting each fold — fine for a canonical map, absurd for an index):

 * batch N's postings land under `path/_stream/batch=N/bucket=B/…`,
   written with per-batch OVERWRITE — a redelivered batch id rewrites
   the same directory with the same rows instead of duplicating them.
 * the batch's sidecar counts go to `path/_stream/_meta_bN.json`,
   written LAST: a segment is COMMITTED iff its marker exists. A crash
   between the parquet write and the marker leaves an uncommitted
   directory that queries ignore entirely (rows AND counts — the
   `batch IN (committed…)` literal filter prunes the directory), and
   the replay simply overwrites it.
 * `_stream` starts with an underscore, so the BASE index read
   (`spark.read.parquet(path)`) never lists it — base and segments
   only meet in `bm25_against_index`'s explicit union.

df is never stored (recomputed per query from the slice read), so
segment counts can't go stale — the same property that makes the batch
`append_to_bm25_index` exact. `compact_bm25_index` folds accumulated
segments into the base partitions when the segment count grows.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.retrieval import _postings_frame


def committed_stream_batches(path: str) -> list[int]:
    """Batch ids with a committed index segment (marker file present),
    ascending."""
    out = []
    for mp in glob.glob(os.path.join(path, "_stream", "_meta_b*.json")):
        with open(mp) as f:
            out.append(int(json.load(f)["batch_id"]))
    return sorted(out)


def fold_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> bool:
    """One idempotent fold (the foreachBatch body, exposed for direct
    testing): write batch postings as a partitioned segment, then
    commit the marker. Returns True if folded, False if skipped as
    already committed or empty."""
    if batch_id in committed_stream_batches(path) or batch_df.isEmpty():
        return False
    with open(os.path.join(path, "_bm25_meta.json")) as f:
        n_buckets = int(json.load(f)["n_buckets"])
    postings, per_doc = _postings_frame(
        batch_df, n_buckets, text_col, id_col
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).first()
    seg = os.path.join(path, "_stream", f"batch={batch_id}")
    postings.repartition(F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(seg)
    marker = os.path.join(path, "_stream", f"_meta_b{batch_id}.json")
    with open(marker, "w") as f:
        json.dump(
            {
                "batch_id": int(batch_id),
                "n_docs": int(agg["n_docs"]),
                "total_dl": int(agg["total_dl"] or 0),
            },
            f,
        )
    return True


def stream_index_documents(
    doc_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Attach the fold to a document stream (columns: doc_id, text).
    The base index must already exist (`build_bm25_index`, possibly on
    an empty corpus). Returns the StreamingQuery; query the live index
    any time with `bm25_against_index(spark, path, terms)`."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fold_index_batch(batch_df, batch_id, path, text_col, id_col)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_bm25_index(spark, path: str) -> int:
    """Fold every COMMITTED streaming segment into the base index:
    append the segment postings to the base bucket partitions, fold
    their counts into the base sidecar, then drop the segments and
    markers. Returns the number of segments compacted.

    Two steps: (1) append segment postings to the base partitions,
    (2) fold counts into the sidecar and delete the segments+markers.
    Honest contract: UNLIKE the fold path, compaction is NOT
    crash-idempotent — a crash between 1 and 2 leaves the appended
    rows in the base while the segments are still committed, so both a
    concurrent query and a compaction rerun would double-count them.
    Run it in a single-writer maintenance window and rebuild on a
    failed run; on a lakehouse table format steps 1+2 become one
    atomic commit and the caveat disappears. The streaming fold path
    never requires compaction for correctness — it only bounds the
    per-query segment count.
    """
    import shutil

    from pyspark.sql import functions as F

    committed = committed_stream_batches(path)
    if not committed:
        return 0
    with open(os.path.join(path, "_bm25_meta.json")) as f:
        meta = json.load(f)
    stream_dir = os.path.join(path, "_stream")
    cols = "term string, doc_id long, tf double, dl double"
    seg = (
        spark.read.schema(f"{cols}, bucket bigint, batch bigint")
        .parquet(stream_dir)
        .where(F.col("batch").isin(committed))
        .drop("batch")
    )
    seg.repartition(F.col("bucket")).write.mode("append").partitionBy(
        "bucket"
    ).parquet(path)
    for b in committed:
        with open(os.path.join(stream_dir, f"_meta_b{b}.json")) as f:
            bm = json.load(f)
        meta["n_docs"] += int(bm["n_docs"])
        meta["total_dl"] += int(bm["total_dl"])
    with open(os.path.join(path, "_bm25_meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(stream_dir)
    return len(committed)
