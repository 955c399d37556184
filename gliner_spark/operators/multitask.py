"""Multitask pipelines as DataFrame operators: classification, QA,
summarization, open extraction.

Exactly how the reference reuses one model for five tasks — a prompt
rewrite plus a tiny post-processing rule around the SAME scoring stage
(gliner/multitask/base.py:104-112) — expressed Spark-first:

 * prompt templating (SURVEY §2.8 F4) is a native `concat` projection,
 * scoring reuses operators/ner.extract_entities (one narrow mapInArrow),
 * the post-processing rules (SURVEY §2.5 W2 top-score pick, §2.6 K1/K2
   sorts) are native aggregations: `sort_array(collect_list(struct(…)))`
   gives the deterministic ordered list per row without a window shuffle
   per element — ordering keys chosen to reproduce the reference's
   stable-sort tie behavior ((−score, start, end) ≙ Python stable sort by
   score desc over the start-ordered entity list).

Semantics citations per task: see kernel/multitask.py (the oracle these
operators are parity-tested against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..kernel.multitask import CLS_PROMPT, QA_PROMPT, SUM_PROMPT
from .ner import extract_entities

_KEYS = ("conv_id", "turn_idx")


def _with_prompt(df: DataFrame, prompt_prefix: str, text_col: str) -> DataFrame:
    return df.select(
        *_KEYS,
        F.concat(
            F.lit(prompt_prefix), F.lit(" \n "), F.col(text_col)
        ).alias("text"),
    )


def _sorted_preds(ents: DataFrame) -> DataFrame:
    """Per key: entity list sorted score-desc with the reference's stable
    tie behavior, as one hash aggregation."""
    item = F.struct(
        (-F.col("score")).alias("negscore"),
        F.col("start"),
        F.col("end"),
        F.col("text"),
    )
    return ents.groupBy(*_KEYS).agg(
        F.sort_array(F.collect_list(item)).alias("preds")
    )


def classify(
    transcripts: DataFrame,
    classes: list[str],
    threshold: float = 0.5,
    cfg: PipelineConfig | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (conv_id, turn_idx, label, score): single-label classification.

    label = top-scoring span text; score = softmax over the row's sorted
    scores at position 0; rows with no prediction → ('other', 1.0)."""
    prompts = _with_prompt(
        transcripts, CLS_PROMPT.format(", ".join(classes)), text_col
    )
    ents = extract_entities(prompts, classes, cfg, threshold)
    agg = _sorted_preds(ents)
    scores = F.transform(F.col("preds"), lambda p: -p.getField("negscore"))
    smax = F.array_max(scores)
    sum_exp = F.aggregate(
        scores,
        F.lit(0.0),
        lambda acc, s: acc + F.exp(s - smax),
    )
    top = F.element_at(F.col("preds"), 1)
    classified = agg.select(
        *_KEYS,
        top.getField("text").alias("label"),
        (F.exp(-top.getField("negscore") - smax) / sum_exp).alias("score"),
    )
    # rows with zero predictions never reach the aggregate → default join
    return (
        transcripts.select(*_KEYS)
        .join(classified, on=list(_KEYS), how="left")
        .select(
            *_KEYS,
            F.coalesce("label", F.lit("other")).alias("label"),
            F.coalesce("score", F.lit(1.0)).alias("score"),
        )
    )


def answer(
    transcripts: DataFrame,
    question: str,
    threshold: float = 0.5,
    cfg: PipelineConfig | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (conv_id, turn_idx, rank, answer, score), rank 1 = best."""
    prompts = _with_prompt(transcripts, QA_PROMPT.format(question), text_col)
    ents = extract_entities(prompts, ["answer"], cfg, threshold)
    agg = _sorted_preds(ents)
    return agg.select(
        *_KEYS, F.posexplode("preds").alias("idx", "pred")
    ).select(
        *_KEYS,
        (F.col("idx") + 1).alias("rank"),
        F.col("pred").getField("text").alias("answer"),
        (-F.col("pred").getField("negscore")).alias("score"),
    )


def summarize(
    transcripts: DataFrame,
    threshold: float = 0.25,
    cfg: PipelineConfig | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (conv_id, turn_idx, summary): extractive chunks sorted by start,
    joined with spaces (reference summarization.py:47-66)."""
    prompts = _with_prompt(transcripts, SUM_PROMPT, text_col)
    ents = extract_entities(prompts, ["summary"], cfg, threshold)
    item = F.struct(F.col("start"), F.col("end"), F.col("text"))
    agg = ents.groupBy(*_KEYS).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(item)),
                lambda p: p.getField("text"),
            ),
        ).alias("summary")
    )
    return (
        transcripts.select(*_KEYS)
        .join(agg, on=list(_KEYS), how="left")
        .select(*_KEYS, F.coalesce("summary", F.lit("")).alias("summary"))
    )


def open_extract(
    transcripts: DataFrame,
    labels: list[str],
    threshold: float = 0.5,
    cfg: PipelineConfig | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ raw entities over ' \\n '-prefixed prompts; offsets intentionally
    NOT shifted (reference open_extraction.py:46-57 returns predictions
    verbatim)."""
    prompts = transcripts.select(
        *_KEYS,
        F.concat(F.lit(" \n "), F.col(text_col)).alias("text"),
    )
    return extract_entities(prompts, labels, cfg, threshold)
