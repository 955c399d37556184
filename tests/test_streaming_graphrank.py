"""Streaming PageRank maintenance: per-batch warm-started refreshes
equal a cold pagerank over everything ever folded; replays, empty
batches, and crash-orphaned partials are no-ops; rank generations prune
without losing the shard list."""

from pyspark.sql import Row

from gliner_spark.operators.graph import pagerank
from gliner_spark.streaming.graphrank import (
    committed_generations,
    current_ranks,
    fold_edge_batch,
    stream_pagerank,
)

# irregular degrees (a regular graph has trivially uniform ranks)
BATCHES = [
    sorted({((i * i + i) % 13, (i * 7 + 2) % 17) for i in range(40)}),
    [(0, 16), (16, 2), (5, 16)],
    [(16, 7), (3, 11), (11, 3)],
]
TOL = 1e-10


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in pairs]
    )


def _rank_map(df):
    return {r.entity_id: r.rank for r in df.collect()}


def _cold(spark, upto):
    pairs = [p for b in BATCHES[:upto] for p in b]
    return _rank_map(
        pagerank(
            _edges(spark, pairs), max_iter=100, tol=TOL,
            src_col="src", dst_col="dst",
        )
    )


def _assert_close(got, want, abs_tol=1e-7):
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) <= abs_tol, (k, got[k], v)


def _drop_all(spark, base):
    import os
    import shutil

    for t in spark.catalog.listTables():
        if t.name.startswith(base):
            spark.sql(f"drop table if exists {t.name}")
    # a KILLED previous run leaves warehouse DIRECTORIES with no catalog
    # entry; drop-if-exists can't see them and the next saveAsTable dies
    # with LOCATION_ALREADY_EXISTS (CLAUDE.md warehouse lesson) — sweep
    # the prefix dirs too, like tools/stream_kg_job.py does
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    if os.path.isdir(wh):
        for d in os.listdir(wh):
            if d.startswith(base):
                shutil.rmtree(os.path.join(wh, d), ignore_errors=True)


def test_fold_parity_replay_crash_and_pruning(spark):
    base = "sgr"
    _drop_all(spark, base)  # stale state from a crashed run
    try:
        for i, b in enumerate(BATCHES):
            assert fold_edge_batch(
                _edges(spark, b), i, base, keep_generations=2, tol=TOL
            ) is True
            _assert_close(
                _rank_map(current_ranks(spark, base)), _cold(spark, i + 1)
            )
        want = _cold(spark, len(BATCHES))

        # pruned to keep_generations=2, shard tables all retained
        assert committed_generations(spark, base) == [1, 2]
        shard_tables = {
            t.name for t in spark.catalog.listTables()
            if t.name.startswith(f"{base}_e")
        }
        assert shard_tables == {f"{base}_e{i}" for i in range(3)}

        # replay of a committed batch id: no-op, ranks unchanged
        assert fold_edge_batch(
            _edges(spark, BATCHES[2]), 2, base, tol=TOL
        ) is False
        # empty batch: no-op, commits nothing
        assert fold_edge_batch(
            _edges(spark, BATCHES[0]).limit(0), 9, base, tol=TOL
        ) is False
        assert committed_generations(spark, base) == [1, 2]
        _assert_close(_rank_map(current_ranks(spark, base)), want)

        # crash before the marker: an orphan shard + ranks table without
        # meta is INVISIBLE (generation uncommitted, shard ignored)
        _edges(spark, [(90, 91)]).write.mode("overwrite").saveAsTable(
            f"{base}_e7"
        )
        current_ranks(spark, base).write.mode("overwrite").saveAsTable(
            f"{base}_b7_ranks"
        )
        assert committed_generations(spark, base) == [1, 2]
        _assert_close(_rank_map(current_ranks(spark, base)), want)
        # the replayed fold overwrites the partial and commits
        assert fold_edge_batch(
            _edges(spark, [(90, 91)]), 7, base, tol=TOL
        ) is True
        got = _rank_map(current_ranks(spark, base))
        pairs = [p for b in BATCHES for p in b] + [(90, 91)]
        _assert_close(
            got,
            _rank_map(pagerank(
                _edges(spark, pairs), max_iter=100, tol=TOL,
                src_col="src", dst_col="dst",
            )),
        )
    finally:
        _drop_all(spark, "sgr")


def test_stream_pagerank_end_to_end_and_restart(
    spark, tmp_path_factory
):
    land = str(tmp_path_factory.mktemp("sgr_land"))
    ckpt = str(tmp_path_factory.mktemp("sgr_ckpt"))
    base = "sgrs"
    _drop_all(spark, base)  # stale state from a crashed run
    try:
        for i, b in enumerate(BATCHES):
            _edges(spark, b).coalesce(1).write.parquet(f"{land}/f{i}")

        def run():
            stream = (
                spark.readStream.schema("src long, dst long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{land}/f*")
            )
            q = stream_pagerank(
                stream, base, ckpt, keep_generations=1, tol=TOL
            )
            q.awaitTermination(600)

        run()
        gens = committed_generations(spark, base)
        assert len(gens) == 1  # pruned to keep_generations=1
        want = _cold(spark, len(BATCHES))
        _assert_close(_rank_map(current_ranks(spark, base)), want)

        # restart on the same checkpoint: no new files -> nothing folds
        run()
        assert committed_generations(spark, base) == gens
        _assert_close(_rank_map(current_ranks(spark, base)), want)
    finally:
        _drop_all(spark, "sgrs")
