"""Learned quality filter — logistic regression on hashed bag-of-grams
(the FineWeb-edu / LLaMA-style "quality classifier" stage: train on a
small positive set (curated/edu-like) vs a negative sample (raw crawl),
then score the whole corpus and keep the top slice).

Spark-first training as a DRIVER LOOP where each iteration is ONE
map-side-combining aggregate over the corpus (the pagerank / k-means
stance — the driver holds only the O(n_buckets) weight vector, never
data):

  features   per-doc bucket-id array from the SAME portable-md5
             unigram+bigram hashing as DSIR / corpus_divergence (one
             shared feature space across the learned-filter family),
             precomputed ONCE and localCheckpoint'd — iterations never
             re-tokenize;
  forward    w·x per doc is a map-side array fold over the bucket ids,
             the weight vector riding as a ONE-ROW broadcast column
             (the broadcast-tensor rule — never a literal);
  gradient   residual (σ(w·x) − y) exploded per bucket id →
             groupBy(bucket).sum — ≤ n_buckets + 1 (hash, sum) rows
             shuffle and collect per iteration, corpus-size
             independent driver state.

Scoring a corpus with a trained model is a pure map, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams
from .similarity import _with_const

__all__ = ["train_quality_classifier", "score_quality"]


def _bucket_arr(text_col: str, n_buckets: int):
    """array<int> of feature-bucket ids (unigrams + bigrams, repeats
    kept — counts matter). Same portable-md5 bucket math as
    curation._dsir_bucket_sql, composed structurally."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.concat(toks, word_ngrams(toks, 2))
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).cast("int"),
    )


def _margin_expr(n_buckets: int) -> str:
    """w·x + bias as a SQL fold over a `_b` bucket array with `_w`
    riding as the broadcast weight column (bias is _w[n_buckets])."""
    return f"aggregate(_b, _w[{n_buckets}], (acc, b) -> acc + _w[b])"


def train_quality_classifier(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    n_buckets: int = 4096,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
    text_col: str = "text",
) -> list[float]:
    """→ weight vector of length n_buckets + 1 (bias last). Batch
    gradient descent on mean log-loss with L2; one aggregate job per
    iteration. Deterministic given the inputs up to distributed
    float-sum order (~1e-12 per iteration — tolerance-tested against a
    numpy replay)."""
    feats = (
        pos_docs.select(
            _bucket_arr(text_col, n_buckets).alias("_b"),
            F.lit(1.0).alias("_y"),
        )
        .unionByName(
            neg_docs.select(
                _bucket_arr(text_col, n_buckets).alias("_b"),
                F.lit(0.0).alias("_y"),
            )
        )
        .localCheckpoint()
    )
    n = feats.count()
    if n == 0:
        raise ValueError("train_quality_classifier: empty training set")
    w = [0.0] * (n_buckets + 1)
    for _ in range(iters):
        with_w = _with_const(feats, "_w", w, "array<double>")
        margin = F.expr(_margin_expr(n_buckets))
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("_y")
        rows = (
            with_w.select(
                resid.alias("_r"),
                # bias rides as a synthetic always-on bucket id
                F.explode(
                    F.concat("_b", F.array(F.lit(n_buckets)))
                ).alias("b"),
            )
            .groupBy("b")
            .agg(F.sum("_r").alias("g"))
            .collect()
        )
        grad = [0.0] * (n_buckets + 1)
        for r in rows:
            grad[r["b"]] = r["g"] / n
        w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, grad)]
    return w


def score_quality(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
) -> DataFrame:
    """Pure-map scoring: docs + quality_prob = σ(w·x), rounded 6dp.
    The weight vector rides as a one-row broadcast column; no shuffle
    touches the corpus."""
    n_buckets = len(weights) - 1
    with_w = _with_const(
        docs, "_w", [float(x) for x in weights], "array<double>"
    )
    prob = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-F.expr(_margin_expr(n_buckets)))
    )
    return (
        with_w.withColumn("_b", _bucket_arr(text_col, n_buckets))
        .withColumn("quality_prob", F.round(prob, 6))
        .drop("_b", "_w")
    )
