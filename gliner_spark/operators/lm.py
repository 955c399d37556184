"""Corpus-trained n-gram language-model perplexity — the CCNet/KenLM-
style quality signal large-scale pretraining pipelines use to rank and
filter documents (a learned complement to the heuristic
textstats.quality_scores).

The reference has no LM-filter stage (its data prep is NER-example
shaped); this is part of the training-data-pipeline surface the Spark
engine adds. Re-expressed Spark-first instead of wrapping a KenLM
binary: training IS two aggregations, scoring IS a join — the shapes
Catalyst already optimizes.

Model: add-k smoothed conditional bigram over lowercased regex tokens
with a BOS context per document,

    p(cur | prev) = (count(prev, cur) + k) / (count(prev) + k·V)

where V is the predicted-token vocabulary size. Everything is exact
integer counting until the final log, so a DuckDB oracle reproduces
scores to float64 (`lm_perplexity` driver query).

Scale shape:
* training — one narrow map (token explode) feeding two map-side-
  combining aggregates (bigram counts, context counts) + one global
  distinct count: two shuffles on string keys, both partial-aggregated.
* scoring — the exploded (doc_id, prev, cur) stream joins the model.
  An UNPRUNED bigram table at web scale is huge, so `prune_min_count`
  drops rare bigrams from the table (their probability mass is
  reconstructed exactly: a missing bigram scores (b_dropped + k) with
  b_dropped unknown — hence pruning keeps the SMOOTHED floor (0 + k),
  the standard stupid-backoff-style approximation, flagged per row).
  A pruned model small enough to broadcast turns scoring into a
  shuffle-free map-side join (`broadcast_model=True`); otherwise it is
  a hash join on the bigram key where AQE handles head-bigram skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["train_bigram_lm", "score_perplexity", "BigramLM"]

BOS = "<s>"


class BigramLM:
    """Handle holding the three trained pieces: bigram counts, context
    counts, and the scalar (V, k)."""

    def __init__(self, bigrams: DataFrame, contexts: DataFrame,
                 vocab_size: int, k: float):
        self.bigrams = bigrams          # (prev, cur, b)
        self.contexts = contexts        # (prev, c)
        self.vocab_size = int(vocab_size)
        self.k = float(k)


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, prev, cur) stream: lowercased regex tokens, BOS context
    for the first token of each doc. Pure map + explode — no shuffle."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    cur = F.col("toks")
    prev = F.concat(
        F.array(F.lit(BOS)), F.slice(cur, 1, F.size(cur) - 1)
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(prev.alias("prev"), cur.alias("cur"))
            ).alias("bg"),
        )
        .select(
            "doc_id",
            F.col("bg.prev").alias("prev"),
            F.col("bg.cur").alias("cur"),
        )
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    k: float = 0.5,
    prune_min_count: int = 1,
) -> BigramLM:
    """Count-based training: two map-side-combining aggregates over the
    bigram stream. `prune_min_count` > 1 drops rare bigrams from the
    stored table (context counts and V stay EXACT — only the per-bigram
    numerator degrades to the smoothed floor for pruned entries)."""
    g = _doc_bigrams(docs, text_col)
    bigrams = g.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("b"))
    if prune_min_count > 1:
        bigrams = bigrams.where(F.col("b") >= prune_min_count)
    contexts = g.groupBy("prev").agg(F.count(F.lit(1)).alias("c"))
    vocab_size = g.select("cur").distinct().count()
    return BigramLM(bigrams, contexts, vocab_size, k)


def score_perplexity(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-doc LM score under the trained model:
    (doc_id, n_bigrams, n_hits, avg_logprob, perplexity).

    avg_logprob = mean over the doc's bigrams of
    ln((b + k) / (c + k·V)), with b = 0 for bigrams missing from the
    (possibly pruned) table and c = 0 for unseen contexts — both smooth
    to well-defined probabilities, so unseen text scores finitely.
    perplexity = exp(-avg_logprob)."""
    g = _doc_bigrams(docs, text_col)
    bg = model.bigrams
    cx = model.contexts
    if broadcast_model:
        bg, cx = F.broadcast(bg), F.broadcast(cx)
    kv = model.k * model.vocab_size
    lp = F.log(
        (F.coalesce(F.col("b"), F.lit(0)) + F.lit(model.k))
        / (F.coalesce(F.col("c"), F.lit(0)) + F.lit(kv))
    )
    scored = (
        g.join(bg, ["prev", "cur"], "left")
        .join(cx, ["prev"], "left")
        .select("doc_id", lp.alias("lp"), F.col("b").isNotNull().alias("hit"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("hit").cast("long")).alias("n_hits"),
            F.avg("lp").alias("avg_logprob"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_hits",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )
