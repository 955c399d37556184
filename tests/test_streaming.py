"""Structured-Streaming path: stream == batch results, windowed counts,
idempotent foreachBatch KG bridge."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.sources.transcripts import synth_transcripts
from gliner_spark.streaming.ingest import (
    read_transcript_stream,
    stream_entities,
    stream_to_kg,
    windowed_entity_counts,
)

LABELS = ["person", "organization", "tool"]


@pytest.fixture(scope="module")
def landing_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("landing"))
    synth_transcripts(spark, n_convs=15).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch(spark, landing_dir, tmp_path_factory):
    from gliner_spark.operators.ner import extract_entities

    stream = read_transcript_stream(spark, landing_dir)
    assert stream.isStreaming
    ents = stream_entities(stream, LABELS)
    sink = "stream_ents"
    q = (
        ents.writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(tmp_path_factory.mktemp("ckpt_ents")),
        )
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.conv_id, r.turn_idx, r.start, r.end, r.label)
        for r in spark.sql(f"select * from {sink}").collect()
    }
    batch = spark.read.parquet(landing_dir)
    exp = {
        (r.conv_id, r.turn_idx, r.start, r.end, r.label)
        for r in extract_entities(batch, LABELS).collect()
    }
    assert got == exp and len(got) > 0


def test_windowed_counts_with_watermark(spark, landing_dir, tmp_path_factory):
    stream = read_transcript_stream(spark, landing_dir)
    counts = windowed_entity_counts(
        stream_entities(stream, LABELS), window="1 hour", watermark="2 hours"
    )
    # complete mode: append-mode windows only flush when a LATER batch
    # advances the watermark past window end; a single availableNow batch
    # never does, so the memory-sink check uses complete output
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("ckpt_win"))
        )
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from win_counts").collect()
    assert len(rows) > 0
    assert all(r.n_mentions > 0 for r in rows)
    assert {c for c in spark.table("win_counts").columns} == {
        "window_start", "window_end", "label", "n_mentions",
    }


def test_stream_to_kg_idempotent(spark, landing_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    ckpt = str(tmp_path_factory.mktemp("kg_ckpt"))
    stream = read_transcript_stream(spark, landing_dir)
    q = stream_to_kg(stream, out, ckpt, LABELS, ["uses"])
    q.awaitTermination(600)
    t1 = spark.read.parquet(f"{out}/triples_stream")
    n1 = t1.count()
    assert n1 > 0
    # restart with same checkpoint: no new data → no change
    q2 = stream_to_kg(
        read_transcript_stream(spark, landing_dir), out, ckpt, LABELS, ["uses"]
    )
    q2.awaitTermination(600)
    assert spark.read.parquet(f"{out}/triples_stream").count() == n1


def test_stream_dedup_within_watermark(spark, tmp_path_factory):
    """Duplicates across micro-batches inside the watermark are dropped;
    distinct contents all survive; state stays bounded by the watermark."""
    import datetime

    from gliner_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from gliner_spark.streaming.ingest import read_transcript_stream, stream_dedup

    land = str(tmp_path_factory.mktemp("dedup_land"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def rows(batch, texts):
        return [
            (f"c{batch}-{i}", 0, "user", t, None,
             t0 + datetime.timedelta(seconds=batch * 60 + i))
            for i, t in enumerate(texts)
        ]

    # batch 1 and batch 2 overlap on two texts (and batch 2 repeats one
    # of its own); each lands as a separate file = separate micro-batch
    spark.createDataFrame(
        rows(1, ["alpha doc", "beta doc", "gamma doc"]), TRANSCRIPT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(land)
    spark.createDataFrame(
        rows(2, ["beta doc", "delta doc", "gamma doc", "delta doc"]),
        TRANSCRIPT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(land)

    deduped = stream_dedup(
        read_transcript_stream(spark, land, max_files_per_trigger=1)
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.text for r in spark.sql("select text from dedup_sink").collect()]
    assert sorted(got) == ["alpha doc", "beta doc", "delta doc", "gamma doc"]
