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


_PAYLOAD_BYTES = 64  # power of two: histogram/64 is exact in float32 AND
# double, so the fake-feature values are bit-identical across engines


def synth_asset_byte(asset_id, i, seed: int = 42):
    """Byte i of asset `asset_id`'s payload: a plain LCG-style mix,
    (a·id + b·i + c) mod 256 — ARITHMETIC on purpose, so a DuckDB oracle
    can regenerate the exact payload (xxhash64 payloads would make the
    whole multimodal path un-oracle-able, which is how r01's query ended
    up rows-only)."""
    a, b, c = 2654435761, 40503, seed * 97 + 13
    return F.pmod(
        F.lit(a) * asset_id + F.lit(b) * F.lit(i) + F.lit(c), F.lit(256)
    )


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic binary assets — 64-byte payloads from the
    cross-engine arithmetic generator (unhex of concatenated byte hex)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")
        ).alias("kind"),
        F.unhex(
            F.concat(
                *[
                    F.lpad(
                        F.hex(synth_asset_byte(F.col("id"), i, seed)), 2, "0"
                    )
                    for i in range(_PAYLOAD_BYTES)
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224,
    decoder: str = "fake",
) -> DataFrame:
    """Image resize as a mapInPandas stage. decoder="real" is the
    PIL.Image.resize integration point (NotImplemented here);
    decoder="fake" emits a deterministic payload of the TARGET size
    (hash-expanded bytes) so downstream batch-shape/memory behavior — the
    Spark-side contract — is exercised for real: each output row carries
    width·height bytes, so partition sizing and Arrow batch limits see
    production-shaped data."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            raise NotImplementedError(
                "PIL is not installed in this container; use decoder='fake'"
            )
        n_bytes = width * height
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            out_payloads = []
            for buf in imgs["data"]:
                seed = np.frombuffer(buf[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
                rng = np.random.RandomState(int(seed % (2**32)))
                out_payloads.append(rng.bytes(n_bytes))
            yield pd.DataFrame(
                {
                    "asset_id": imgs["asset_id"].values,
                    "width": np.full(len(imgs), width, dtype=np.int32),
                    "height": np.full(len(imgs), height, dtype=np.int32),
                    "data": out_payloads,
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands per-asset frame indices natively
    (metadata-driven; the decode of each sampled frame is the stubbed
    step). Demonstrates the explode-then-decode partition shape: sampling
    plan rows are tiny, so the shuffle (if any) moves indices, not bytes.
    Synthetic frame counts use the arithmetic generator (not xxhash64) so
    the plan is DuckDB-oracle-checkable."""
    n_frames = (
        F.pmod(F.lit(48271) * F.col("asset_id") + F.lit(11), F.lit(300)) + 1
    ).cast("int")
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
