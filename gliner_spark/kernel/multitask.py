"""Pure-Python oracle for the multitask pipelines (classification, QA,
summarization, open extraction).

Mirrors gliner/multitask/*.py: each pipeline is prompt rewrite →
`model.run(prompts, labels, threshold)` → a small post-processing rule
(gliner/multitask/base.py:90-112). Reference semantics per task:

 classification  prompt "Classify text into the following classes: {cs}"
                 + " \\n " + text (classification.py:35,153-158); labels =
                 classes; single-label: sort predictions score-desc
                 (Python stable sort over the start-ordered entity list),
                 label = TOP SPAN TEXT, score = softmax over the sorted
                 scores, position 0 (classification.py:108-134); empty →
                 ('other', 1.0).
 QA              prompt "Answer the following question: {q} \\n {text}"
                 (question_answering.py:31,80-88 — note the reference
                 always uses questions[0] for a list); labels=['answer'];
                 answers sorted score-desc (question_answering.py:48-67).
 summarization   prompt "Summarize the following text highlighting the
                 most important information: \\n {text}"
                 (summarization.py:30,79-84); labels=['summary'],
                 threshold 0.25; chunks sorted start-asc, joined by ' '
                 (summarization.py:47-66).
 open extraction prompt " \\n " + text (open_extraction.py:30,71-74,
                 empty template); predictions returned raw, char offsets
                 NOT shifted (process_predictions is identity, :46-57).

The flat-NER decode means two accepted spans never share a start, so the
start-asc and score-desc sorts here are tie-free given distinct scores;
score ties keep the start-ordered input order (Python stable sort), which
the Spark side reproduces with (−score, start, end) struct ordering.
"""

from __future__ import annotations

import numpy as np

from .oracle import OraclePipeline

CLS_PROMPT = "Classify text into the following classes: {}"
QA_PROMPT = "Answer the following question: {}"
SUM_PROMPT = (
    "Summarize the following text highlighting the most important information:"
)


def softmax(scores: list[float]) -> list[float]:
    a = np.asarray(scores, dtype=np.float64)
    e = np.exp(a - a.max())
    return (e / e.sum()).tolist()


class OracleMultitask:
    def __init__(self, pipeline: OraclePipeline | None = None):
        self.pipeline = pipeline or OraclePipeline()

    def classify(
        self, texts: list[str], classes: list[str], threshold: float = 0.5
    ) -> list[dict]:
        cs = ", ".join(classes)
        prompts = [f"{CLS_PROMPT.format(cs)} \n {t}" for t in texts]
        preds = self.pipeline.run(prompts, classes, threshold=threshold)
        out = []
        for pred in preds:
            s = sorted(pred, key=lambda e: e["score"], reverse=True)
            if not s:
                out.append({"label": "other", "score": 1.0})
                continue
            probs = softmax([e["score"] for e in s])
            out.append({"label": s[0]["text"], "score": probs[0]})
        return out

    def answer(
        self, texts: list[str], question: str, threshold: float = 0.5
    ) -> list[list[dict]]:
        prompts = [f"{QA_PROMPT.format(question)} \n {t}" for t in texts]
        preds = self.pipeline.run(prompts, ["answer"], threshold=threshold)
        return [
            [
                {"answer": e["text"], "score": e["score"]}
                for e in sorted(p, key=lambda e: e["score"], reverse=True)
            ]
            for p in preds
        ]

    def summarize(
        self, texts: list[str], threshold: float = 0.25
    ) -> list[str]:
        prompts = [f"{SUM_PROMPT} \n {t}" for t in texts]
        preds = self.pipeline.run(prompts, ["summary"], threshold=threshold)
        return [
            " ".join(
                e["text"] for e in sorted(p, key=lambda e: e["start"])
            )
            for p in preds
        ]

    def open_extract(
        self, texts: list[str], labels: list[str], threshold: float = 0.5
    ) -> list[list[dict]]:
        prompts = [f" \n {t}" for t in texts]
        return self.pipeline.run(prompts, labels, threshold=threshold)
