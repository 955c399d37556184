"""Deterministic Spark-native synthetic transcripts source.

Produces the input table shape mandated by BASELINE.json `input_hint`:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Design points:
 - 100% native expressions (spark.range + xxhash64 + sequence/transform) —
   generation itself scales to 10^12 turns with zero driver-side data and
   no Python; determinism comes from xxhash64 over (seed, conv, turn, pos).
 - conversation lengths are drawn from a skewed 3-bucket distribution
   (80% short / 15% medium / 5% long) so the conv_id skew handling the
   north rule demands is actually exercised.
 - vocabulary mixes filler words with entity-like surface forms, including
   near-duplicate variants ("Acme Corp" / "Acme Corporation" / "acme-corp")
   so MinHash-LSH entity linking has real work to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_FILLER = (
    "the a of to and in is on for with we you it that this restart deploy "
    "check latency error retry cache query table shuffle join index metric "
    "cluster node batch stream log trace alert page fix ship merge test run "
    "slow fast big small new old now then please thanks ok done failed"
).split()

_ENTITIES = [
    "Alice Chen", "alice chen", "A. Chen",
    "Bob Martinez", "bob-martinez", "Bob M. Martinez",
    "Acme Corp", "Acme Corporation", "acme-corp",
    "Globex", "Globex Inc", "globex inc.",
    "Zurich", "zurich", "New York", "new-york",
    "payment-service", "payment service", "PaymentService",
    "search-indexer", "Search Indexer",
    "cluster-7", "Cluster 7", "GPU-A100", "gpu a100",
    "Initech", "initech", "Umbrella Labs", "umbrella-labs",
    "Kafka", "kafka broker", "Redis", "redis-cache",
]

_ROLES = ["user", "assistant", "assistant", "tool", "system"]
_TOOLS = ["bash", "search", "sql", "browser", "none"]

VOCAB = _FILLER + _ENTITIES


def synth_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    min_words: int = 4,
    max_words: int = 30,
) -> DataFrame:
    """Deterministic transcripts DataFrame of ~8×n_convs turns."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    roles = F.array(*[F.lit(r) for r in _ROLES])
    tools = F.array(*[F.lit(t) for t in _TOOLS])
    s = F.lit(seed)

    convs = spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("cid"),
    )
    # skewed conversation lengths: 80% in [2,8], 15% in [9,24], 5% in [25,96]
    bucket = F.pmod(F.xxhash64(s, F.col("cid"), F.lit("len")), F.lit(100))
    h2 = F.xxhash64(s, F.col("cid"), F.lit("len2"))
    n_turns = (
        F.when(bucket < 80, F.lit(2) + F.pmod(h2, F.lit(7)))
        .when(bucket < 95, F.lit(9) + F.pmod(h2, F.lit(16)))
        .otherwise(F.lit(25) + F.pmod(h2, F.lit(72)))
    )
    turns = convs.select(
        "conv_id",
        "cid",
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )

    n_words = F.lit(min_words) + F.pmod(
        F.xxhash64(s, F.col("conv_id"), F.col("turn_idx"), F.lit("nw")),
        F.lit(max_words - min_words + 1),
    )
    word_at = lambda i: F.element_at(  # noqa: E731
        vocab,
        (
            F.pmod(
                F.xxhash64(s, F.col("conv_id"), F.col("turn_idx"), i),
                F.lit(len(VOCAB)),
            )
            + 1
        ).cast("int"),
    )
    text = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), n_words - 1), word_at)
    )
    role = F.element_at(
        roles,
        (
            F.pmod(
                F.xxhash64(s, F.col("conv_id"), F.col("turn_idx"), F.lit("r")),
                F.lit(len(_ROLES)),
            )
            + 1
        ).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            tools,
            (
                F.pmod(
                    F.xxhash64(s, F.col("conv_id"), F.col("turn_idx"), F.lit("t")),
                    F.lit(len(_TOOLS)),
                )
                + 1
            ).cast("int"),
        ),
    )
    ts = F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(
        secs=(F.col("cid") * 311 + F.col("turn_idx") * 17).cast("double")
    )

    return turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
