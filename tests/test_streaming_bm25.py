"""Streaming BM25 index maintenance: per-micro-batch segment folds
equal one batch build over everything ever indexed; replayed batch ids
are no-ops; uncommitted (markerless) segments are invisible to queries;
an empty base supports stream-only ingest."""

import json
import os

from gliner_spark.operators.retrieval import (
    bm25_against_index,
    build_bm25_index,
)
from gliner_spark.streaming.bm25 import (
    committed_stream_batches,
    fold_index_batch,
    stream_index_documents,
)

BASE = [
    (0, "spark shuffle join spark spark"),
    (1, "window scan filter table"),
    (2, "spark window window table row"),
]
B0 = [(10, "spark table spark"), (11, "join window join")]
B1 = [(12, "window spark window"), (13, "")]

QUERY = ["spark", "window"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rank(spark, path):
    return [
        (r.doc_id, r.score, r.rk)
        for r in bm25_against_index(spark, path, QUERY, top_k=10).collect()
    ]


def _full_rebuild_rank(spark, tmp_path, rows, tag):
    full = str(tmp_path / f"full_{tag}")
    build_bm25_index(_df(spark, rows), full, n_buckets=8)
    return _rank(spark, full)


def test_stream_folds_equal_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    assert fold_index_batch(_df(spark, B0), 0, path) is True
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0, "b0"
    )
    assert fold_index_batch(_df(spark, B1), 1, path) is True
    assert committed_stream_batches(path) == [0, 1]
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0 + B1, "b01"
    )


def test_replayed_batch_id_is_noop(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    fold_index_batch(_df(spark, B0), 0, path)
    before = _rank(spark, path)
    # redelivery of batch 0 — even with different content — must skip
    assert fold_index_batch(_df(spark, B1), 0, path) is False
    assert _rank(spark, path) == before
    assert committed_stream_batches(path) == [0]


def test_uncommitted_segment_is_invisible(spark, tmp_path):
    """A crash between the segment write and the marker leaves rows and
    counts that queries must not see: simulate by folding then deleting
    the marker."""
    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    base_rank = _rank(spark, path)
    fold_index_batch(_df(spark, B0), 0, path)
    os.remove(os.path.join(path, "_stream", "_meta_b0.json"))
    assert committed_stream_batches(path) == []
    assert _rank(spark, path) == base_rank
    # and the replay commits it properly
    assert fold_index_batch(_df(spark, B0), 0, path) is True
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0, "b0"
    )


def test_stream_only_ingest_from_empty_base(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, []), path, n_buckets=8)
    fold_index_batch(_df(spark, B0 + B1), 0, path)
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, B0 + B1, "only"
    )


def test_stream_index_documents_end_to_end(spark, tmp_path):
    """Real Structured Streaming run: one json file per micro-batch,
    availableNow, then the live index equals a full rebuild."""
    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate((B0, B1)):
        with open(src / f"shard{i}.json", "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}))
                f.write("\n")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_index_documents(
        stream, path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(600)
    assert len(committed_stream_batches(path)) == 2
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0 + B1, "e2e"
    )


def test_compaction_preserves_results_and_drops_segments(spark, tmp_path):
    from gliner_spark.streaming.bm25 import compact_bm25_index

    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    fold_index_batch(_df(spark, B0), 0, path)
    fold_index_batch(_df(spark, B1), 1, path)
    before = _rank(spark, path)
    assert compact_bm25_index(spark, path) == 2
    assert not os.path.exists(os.path.join(path, "_stream"))
    assert committed_stream_batches(path) == []
    assert _rank(spark, path) == before
    # the compacted base keeps folding new segments
    more = [(20, "spark window spark window")]
    fold_index_batch(_df(spark, more), 2, path)
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0 + B1 + more, "post_compact"
    )


def test_compaction_noop_without_segments(spark, tmp_path):
    from gliner_spark.streaming.bm25 import compact_bm25_index

    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    assert compact_bm25_index(spark, path) == 0
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE, "noop"
    )


def test_repeated_compaction_chains_generations(spark, tmp_path):
    """gen1 = gen0 + new segments; queries always read exactly one
    generation."""
    from gliner_spark.streaming.bm25 import compact_bm25_index

    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    fold_index_batch(_df(spark, B0), 0, path)
    assert compact_bm25_index(spark, path) == 1
    fold_index_batch(_df(spark, B1), 1, path)
    assert compact_bm25_index(spark, path) == 1
    assert sorted(os.listdir(os.path.join(path, "_compacted"))) == [
        "_meta_g1.json",
        "gen=1",
    ]
    assert _rank(spark, path) == _full_rebuild_rank(
        spark, tmp_path, BASE + B0 + B1, "gen_chain"
    )


def test_compaction_crash_before_marker_is_invisible(spark, tmp_path):
    """Kill between the generation write and its marker: the markerless
    gen directory must be unreadable, and the rerun compacts cleanly."""
    from gliner_spark.streaming.bm25 import compact_bm25_index

    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    fold_index_batch(_df(spark, B0), 0, path)
    fold_index_batch(_df(spark, B1), 1, path)
    want = _rank(spark, path)
    compact_bm25_index(spark, path)
    # replay the crash: resurrect the segments, strip the marker so
    # only the orphan gen=0 directory remains
    os.remove(os.path.join(path, "_compacted", "_meta_g0.json"))
    fold_index_batch(_df(spark, B0), 0, path)
    fold_index_batch(_df(spark, B1), 1, path)
    assert _rank(spark, path) == want  # orphan dir: rows not doubled
    assert compact_bm25_index(spark, path) == 2  # rerun overwrites it
    assert _rank(spark, path) == want


def test_compaction_crash_before_gc_never_double_counts(spark, tmp_path):
    """Kill after the marker but before cleanup: folded segments still
    on disk are below the max_batch watermark — invisible to queries,
    refused on replay, garbage-collected by the next compaction."""
    from gliner_spark.streaming.bm25 import compact_bm25_index

    path = str(tmp_path / "idx")
    build_bm25_index(_df(spark, BASE), path, n_buckets=8)
    fold_index_batch(_df(spark, B0), 0, path)
    fold_index_batch(_df(spark, B1), 1, path)
    want = _rank(spark, path)
    compact_bm25_index(spark, path)
    # resurrect the folded segments as if GC never ran
    fold_path = os.path.join(path, "_stream")
    assert fold_index_batch(_df(spark, B0), 0, path) is False  # watermark
    os.makedirs(fold_path, exist_ok=True)
    for b, rows in ((0, B0), (1, B1)):
        seg = os.path.join(fold_path, f"batch={b}")
        _postings_write(spark, rows, seg)
        with open(os.path.join(fold_path, f"_meta_b{b}.json"), "w") as f:
            json.dump(
                {"batch_id": b, "n_docs": len(rows), "total_dl": 99}, f
            )
    assert _rank(spark, path) == want  # stale segments never counted
    assert compact_bm25_index(spark, path) == 0  # pure GC
    assert not os.path.exists(fold_path)
    assert _rank(spark, path) == want


def _postings_write(spark, rows, seg):
    from gliner_spark.operators.retrieval import _postings_frame
    from pyspark.sql import functions as F

    postings, _ = _postings_frame(_df(spark, rows), 8, "text", "doc_id")
    postings.repartition(F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(seg)
