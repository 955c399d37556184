"""Streaming canonicalization: per-micro-batch folds equal one batch run
over everything ever seen; replayed batch ids are no-ops; generations
rotate and prune."""

from pyspark.sql import Row

from gliner_spark.operators.linking import canonicalize
from gliner_spark.operators.linking_incremental import (
    build_linking_state,
    canonical_map_from_state,
)
from gliner_spark.streaming.linking import (
    committed_generations,
    current_state_prefix,
    fold_mention_batch,
    stream_canonicalize,
)

PARAMS = dict(
    n_perms=16,
    n_bands=16,
    shingle_n=3,
    jaccard_threshold=0.5,
    seed=42,
    max_bucket_size=None,
)

CORPUS = [
    ("Acme Corp", "organization", 5),
    ("acme-corp", "organization", 3),
    ("Alpha Beta", "organization", 4),
    ("Beta Gamma", "organization", 3),
    ("Zurich", "location", 3),
]

SHARD_FILES = [
    # one file per micro-batch (maxFilesPerTrigger=1)
    [("Alpha Beta Gamma", "organization", 1), ("Kubernetes", "tool", 2)],
    [("acme-corp", "company", 4), ("Zurich", "location", 1)],
    [("Kubernetes Inc", "organization", 1), ("Grafana", "tool", 1)],
]


def _mentions(spark, spec):
    rows = []
    for i, (text, label, n) in enumerate(spec):
        for j in range(n):
            rows.append(Row(text=text, label=label))
    return spark.createDataFrame(rows, "text string, label string")


def _rowset(df):
    return sorted(
        (r.surface, r.entity_id, r.canonical, r.ent_type,
         r.n_mentions, r.entity_mentions)
        for r in df.collect()
    )


def _drop_all(spark, bases):
    for t in spark.catalog.listTables():
        if any(t.name.startswith(b) for b in bases):
            spark.sql(f"drop table if exists {t.name}")


def test_stream_canonicalize_parity_and_idempotent_restart(
    spark, tmp_path_factory
):
    land = str(tmp_path_factory.mktemp("slk_land"))
    ckpt = str(tmp_path_factory.mktemp("slk_ckpt"))
    base = str(tmp_path_factory.mktemp("slk_state"))
    corpus = _mentions(spark, CORPUS)
    try:
        build_linking_state(corpus, "slki", path=f"{base}/init", **PARAMS)
        for i, spec in enumerate(SHARD_FILES):
            _mentions(spark, spec).coalesce(1).write.parquet(f"{land}/f{i}")

        def run():
            stream = (
                spark.readStream.schema("text string, label string")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{land}/f*")
            )
            q = stream_canonicalize(
                stream, "slki", "slkg", ckpt,
                keep_generations=2, max_bucket_size=None,
            )
            q.awaitTermination(600)

        run()
        gens = committed_generations(spark, "slkg")
        assert len(gens) == 2  # pruned to keep_generations
        cur = current_state_prefix(spark, "slkg", "slki")
        assert cur == f"slkg_b{gens[-1]}"

        everything = corpus
        for spec in SHARD_FILES:
            everything = everything.unionByName(_mentions(spark, spec))
        want = _rowset(canonicalize(everything, **PARAMS))
        assert _rowset(canonical_map_from_state(spark, cur)) == want

        # restart on the same checkpoint: no new files -> nothing folds
        run()
        assert committed_generations(spark, "slkg") == gens
        assert _rowset(canonical_map_from_state(spark, cur)) == want

        # direct re-delivery of an already-committed batch id: no-op
        replay = _mentions(spark, SHARD_FILES[-1])
        assert fold_mention_batch(
            replay, gens[-1], "slki", "slkg", max_bucket_size=None
        ) is False
        assert _rowset(canonical_map_from_state(spark, cur)) == want
        # empty batch: also a no-op, commits nothing
        assert fold_mention_batch(
            replay.limit(0), 99, "slki", "slkg", max_bucket_size=None
        ) is False
        assert committed_generations(spark, "slkg") == gens
    finally:
        _drop_all(spark, ("slki_", "slkg_"))
