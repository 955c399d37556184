"""Multimodal asset columns: opaque `binary` payloads + typed metadata.

The image/audio/video decode libraries are not installed in this container
(and the reference has no multimodal path), so the DECODE step is stubbed:
`decoder="fake"` produces deterministic hash-derived features with the real
batch shape, `decoder="real"` raises NotImplementedError at the exact
point where PIL/librosa/av would be called. Everything AROUND the decode —
schema, Arrow batch plumbing, mapInPandas iterator signature, partition
behavior, feature schema — is real and tested, so swapping in a real
decoder on a cluster with the libs installed is a one-function change.

Design: assets are (asset_id, kind, data: binary, meta: map<string,string>).
Feature extraction is mapInPandas (iterator of DataFrames — Arrow batches)
so payload bytes never round-trip through Python row objects, and batch
size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch rather
than partition size (a partition of 4 GB videos still streams in bounded
memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

_FEATURE_DIM = 16


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic binary assets — payload = xxhash64-seeded
    bytes via native expressions (unhex of concatenated hashes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            kinds, (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int")
        ).alias("kind"),
        F.unhex(
            F.concat(
                *[
                    F.lpad(
                        F.hex(F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(i)))),
                        16,
                        "0",
                    )
                    for i in range(4)
                ]
            )
        ).alias("data"),
    )
    return base.withColumn(
        "meta",
        F.create_map(
            F.lit("codec"), F.lit("synthetic"), F.lit("v"), F.lit("1")
        ),
    )


def _fake_decode(data: pd.Series, kind: pd.Series) -> np.ndarray:
    """Deterministic stand-in features: bytes → normalized histogram-ish
    vector. Vectorized over the batch; same output on every run/engine."""
    out = np.zeros((len(data), _FEATURE_DIM), dtype=np.float32)
    for i, buf in enumerate(data):  # ragged bytes; per-batch loop, tiny
        arr = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM)
        out[i] = hist / max(arr.size, 1)
    return out


def extract_features(
    assets: DataFrame, decoder: str = "fake"
) -> DataFrame:
    """assets → (asset_id, kind, n_bytes, feature[16]) via mapInPandas.

    decoder="real" marks the integration point for PIL/librosa/av —
    intentionally NotImplemented in this environment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real decoders (PIL/librosa/av) are not installed in "
                    "this container; use decoder='fake'"
                )
            feats = _fake_decode(pdf["data"], pdf["kind"])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].str.len().astype("int32"),
                    "feature": list(feats),
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands per-asset frame indices natively
    (metadata-driven; the decode of each sampled frame is the stubbed
    step). Demonstrates the explode-then-decode partition shape: sampling
    plan rows are tiny, so the shuffle (if any) moves indices, not bytes."""
    n_frames = (F.pmod(F.xxhash64("asset_id"), F.lit(300)) + 1).cast("int")
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
