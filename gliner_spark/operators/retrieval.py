"""Ranked lexical retrieval over a document corpus: BM25 scoring of a
literal term query, fully native expressions.

Reference scope note: GLiNER itself has no retrieval operator — this is
one of the training-data-pipeline additions (corpus search / example
mining) layered on the same `documents` table as the dedup/quality ops.

Scale shape: the query is a LITERAL term list, so per-term tf is a
map-side `size(filter(tokens, = term))` expression on the token array —
no explode, no (doc, term) shuffle, and the scan pipeline stays in
whole-stage codegen. Corpus statistics (N, avgdl, per-term df) reduce to
ONE single-row global aggregate that joins back as a broadcast; the
final score is again a pure map expression, and the top-k is a
TakeOrderedAndProject (per-partition heap + driver merge of k rows — no
global sort shuffle). Every stage is linear in input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 (Robertson idf, `ln(1 + (N-df+.5)/(df+.5))`,
    so zero-df terms stay finite and contribute 0 via tf=0).

    Ordering is over the 6dp-ROUNDED score with an id tie-break, so the
    returned top-k is deterministic across engines even when two docs'
    raw doubles differ only in summation order.
    """
    if not query_terms:
        raise ValueError("bm25_rank needs at least one query term")
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(word):
        # single-arg lambda on purpose: a two-arg lambda is the
        # (element, index) form to Spark's HOF builder
        return F.size(F.filter(toks, lambda t: t == F.lit(word)))

    per_doc = docs.select(
        id_col,
        F.size(toks).alias("dl"),
        *[
            _tf(w).cast("double").alias(f"tf_{i}")
            for i, w in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        term = idf * F.col(f"tf_{i}") * F.lit(k1 + 1.0) / (
            F.col(f"tf_{i}") + norm
        )
        score = term if score is None else score + term
    scored = per_doc.join(F.broadcast(stats)).select(
        id_col, F.round(score, 6).alias("score")
    )
    ranked = scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rk", F.row_number().over(w))
