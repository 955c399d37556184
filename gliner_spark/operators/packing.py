"""Sequence packing — the batch-assembly step of an LLM pretraining-data
pipeline (the stage right after dedup/curation, before tokenized shards
are written).

The reference processes each example independently and truncates to
max_len (`/root/reference/gliner/data_processing/processor.py` prep /
`config.py:13` max_len) — right for NER batches, wasteful for
pretraining token streams where short documents must share a sequence.
These operators add the two packing shapes large-scale pipelines use:

* `chunk_pack` — GPT-style concat-and-chunk: documents are concatenated
  into per-shard token streams and cut into fixed `max_len` chunks; a
  document may straddle chunk boundaries. Pure window arithmetic (ONE
  shuffle, on the shard key), so the result is exactly reproducible in
  SQL — the `sequence_pack` driver query oracle-checks it vs DuckDB.
* `bin_pack` — no-split next-fit-decreasing: each document lands whole
  in exactly one bin with bin total ≤ max_len. The greedy fill state is
  inherently sequential, so it runs as applyInPandas PER SHARD —
  parallel across shards, sequential within (the honest algorithm, not
  a collect-to-driver loop) — and is oracle-checked via a DuckDB
  recursive CTE that walks the identical (n_tokens desc, doc_id) order.

Scale shape: both operators shuffle ONCE on the shard key, and what a
task holds is per-doc METADATA ((doc_id, n_tokens) pairs), never text.
`n_shards` bounds per-task state and scales with the cluster; the cost
of sharded vs global packing is at most one partial chunk/bin per
shard, which vanishes at 10^12 docs. Deterministic by construction:
shard = pmod(doc_id, n_shards), fixed intra-shard order, no RNG.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.text import token_count, tokens

__all__ = [
    "chunk_pack",
    "bin_pack",
    "packing_stats",
    "shuffle_export",
    "chunk_documents",
]


def _with_shard_and_tokens(
    docs: DataFrame,
    n_shards: int,
    id_col: str,
    text_col: str,
    n_tokens_col: str | None,
) -> DataFrame:
    n = (
        F.col(n_tokens_col)
        if n_tokens_col
        else token_count(F.col(text_col))
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint").alias(
                "shard"
            ),
            n.cast("bigint").alias("n_tokens"),
        )
        # zero-token docs occupy no stream/bin space; drop them here so
        # both engines agree on the packing order
        .where(F.col("n_tokens") > 0)
    )


def chunk_pack(
    docs: DataFrame,
    max_len: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: one output row per (document,
    chunk) incidence.

    Per shard, documents are laid out in doc_id order into a token
    stream; the stream is cut into `max_len`-token chunks. Columns:
    chunk_idx (per shard), tok_start/tok_end (the half-open token slice
    OF THE DOCUMENT that lands in this chunk), pos_in_chunk (where that
    slice starts inside the chunk). A doc spanning k chunks emits k rows.

    Plan: narrow projections + one window over the shard partitioning —
    a single hash exchange on `shard`; the explode multiplies rows only
    for straddling docs (≤ n_tokens/max_len + 1 per doc). Integer `div`
    everywhere — no float in the cut math."""
    d = _with_shard_and_tokens(docs, n_shards, id_col, text_col, n_tokens_col)
    w = Window.partitionBy("shard").orderBy("doc_id")
    lng = F.lit(int(max_len))
    c = d.withColumn("cum_end", F.sum("n_tokens").over(w)).withColumn(
        "start", F.col("cum_end") - F.col("n_tokens")
    )
    c = c.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.expr(f"start div {int(max_len)}"),
                F.expr(f"(cum_end - 1) div {int(max_len)}"),
            )
        ),
    )
    chunk_start = F.col("chunk_idx") * lng
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        "chunk_idx",
        F.greatest(chunk_start - F.col("start"), F.lit(0))
        .cast("bigint")
        .alias("tok_start"),
        F.least(chunk_start + lng - F.col("start"), F.col("n_tokens"))
        .cast("bigint")
        .alias("tok_end"),
        F.greatest(F.col("start") - chunk_start, F.lit(0))
        .cast("bigint")
        .alias("pos_in_chunk"),
    )


_BIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("bin_idx", T.LongType(), False),
        T.StructField("pos_in_bin", T.LongType(), False),
        T.StructField("oversize", T.BooleanType(), False),
    ]
)


def bin_pack(
    docs: DataFrame,
    max_len: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """No-split next-fit-decreasing packing: per shard, documents sorted
    by (n_tokens desc, doc_id) fill bins greedily — when the next doc
    would overflow `max_len`, a new bin opens. Each doc lands whole in
    exactly one bin at offset pos_in_bin. Docs longer than max_len get a
    bin of their own with oversize=true (the caller decides truncate vs
    split; this operator never silently drops tokens).

    The fill state is a genuine left-to-right recurrence, so the shard
    group is processed sequentially inside applyInPandas — the shuffle
    is still the single exchange on `shard`, and the pandas group holds
    only (doc_id, n_tokens) pairs, not document text."""
    d = _with_shard_and_tokens(docs, n_shards, id_col, text_col, n_tokens_col)
    lng = int(max_len)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins, poss = [], []
        bin_idx, fill = -1, lng  # first doc always opens bin 0
        for n in pdf["n_tokens"]:
            if fill + n > lng:
                bin_idx += 1
                fill = 0
            poss.append(fill)
            bins.append(bin_idx)
            fill += n
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["pos_in_bin"] = pd.Series(poss, dtype="int64")
        pdf["oversize"] = pdf["n_tokens"] > lng
        return pdf[
            ["doc_id", "shard", "n_tokens", "bin_idx", "pos_in_bin",
             "oversize"]
        ]

    return d.groupBy("shard").applyInPandas(pack, _BIN_SCHEMA)


def packing_stats(packed: DataFrame, max_len: int) -> DataFrame:
    """Per-shard packing efficiency over a bin_pack result: bins used,
    docs and tokens packed, and fill_ratio = packed_tokens / capacity
    (oversize docs count max_len — their bin is full by definition).
    Map-side-combining aggregate; one row per shard."""
    lng = F.lit(int(max_len))
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin_idx") + 1).alias("n_bins"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.least(F.col("n_tokens"), lng)).alias("packed_tokens"),
        )
        .select(
            "shard",
            "n_bins",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("packed_tokens") / (F.col("n_bins") * lng), 6
            ).alias("fill_ratio"),
        )
    )


def shuffle_export(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the export step
    after packing/curation, where the corpus must ship as N shard files
    whose concatenation reads as a uniformly shuffled stream (training
    dataloaders consume shards sequentially; any residual corpus order
    — crawl order, domain order — becomes curriculum bias).

    All-INTEGER math so the assignment is bit-identical across Spark /
    DuckDB / Python (the md5-uniform stance of curation
    stratified_sample, minus even the float division):

      key   = first 8 md5 hex digits of '<seed>:<id>' as int64
              (uniform on [0, 2^32); seed gives epoch reshuffles)
      shard = (key * n_shards) div 2^32  — size-balanced in expectation
      seq   = rank of (key, id) within the shard

    → (doc_id, shard, seq, shuffle_key). The only wide op is the
    per-shard rank — ONE hash exchange on `shard` feeding a streaming
    row_number, exactly the repartition + sortWithinPartitions shape a
    partitioned shard write wants (compose with
    `df.repartition("shard").sortWithinPartitions("seq").write
    .partitionBy("shard")`). Deliberately NO global orderBy: a total
    sort is a range exchange over the whole corpus, and shard-local
    order is all a dataloader needs.
    """
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    keyed = docs.select(F.col(id_col).alias("doc_id"), key.alias("shuffle_key"))
    # pure int64 div: key < 2^32 and any sane n_shards keeps the product
    # far below 2^63 (ANSI mode would throw on overflow, not wrap)
    shard = F.expr(f"(shuffle_key * {int(n_shards)}) div {1 << 32}")
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("seq", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "seq", "shuffle_key")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    with_text: bool = True,
) -> DataFrame:
    """Per-document fixed-size token chunking with overlap — the RAG /
    retrieval-ingest shape, complementary to `chunk_pack`: chunks NEVER
    cross document boundaries (chunk_pack concatenates docs into a
    stream; retrieval wants each chunk attributable to one source doc).

    stride = chunk_tokens - overlap; chunk i covers token interval
    [i*stride, min(i*stride + chunk_tokens, n)) and
    n_chunks = max(1, ceil((n - overlap) / stride)) — pure integer math
    so the layout replays exactly in SQL/python. Zero-token docs emit
    nothing; a doc shorter than chunk_tokens is one whole chunk.

    Pure map stage (tokens → index sequence → explode), zero shuffle;
    guarded `when(n > 0, ...)` around the index sequence per the
    auto-negating-step rule. chunk_text (optional) is the space-joined
    token slice — the normalized retrieval payload.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col("doc_id"), toks.alias("_toks"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    n_chunks = F.greatest(
        F.lit(1), F.expr(f"(_n - {overlap} + {stride - 1}) div {stride}")
    )
    exploded = base.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk_tokens, F.col("_n"))
    out = exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("tok_start"),
        end.cast("bigint").alias("tok_end"),
        (end - start).cast("bigint").alias("n_chunk_tokens"),
        *(
            [
                F.concat_ws(
                    " ", F.slice("_toks", start + 1, end - start)
                ).alias("chunk_text")
            ]
            if with_text
            else []
        ),
    )
    return out
