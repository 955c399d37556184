"""Drop-in API façade: the reference's public surface, Spark-backed.

A user of the reference drives it through `GLiNER.from_pretrained(...)` →
`predict_entities / batch_predict_entities / run` (gliner/model.py:236-357)
and the multitask pipeline classes (gliner/multitask/*.py). This module
exposes the SAME method names and return shapes so existing call sites
port by changing the import:

    from gliner_spark.api import GLiNERSpark as GLiNER
    model = GLiNER.from_pretrained()
    ents = model.predict_entities("…", ["person", "location"])

Two execution paths per method, chosen by input type:
 * list[str] → the pure-Python kernel oracle on the driver (identical
   semantics to the Spark operators by construction — shared kernel);
 * DataFrame → the distributed operators (`*_df` variants), for corpus-
   scale inputs.

No weights are loaded: the deterministic hashed bi-encoder stands in for
the reference's DeBERTa checkpoint (SURVEY §7.0), so `from_pretrained`
accepts and ignores a model id — semantics (tokenization, span grid,
thresholding, greedy decode, prompt formats, two-pass RE) are the
reference's; the scores themselves are this engine's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .config import PipelineConfig, DEFAULT
from .kernel.multitask import OracleMultitask
from .kernel.oracle import OraclePipeline


class GLiNERSpark:
    """Reference `GLiNER` model-object parity (gliner/model.py)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or DEFAULT
        self._oracle = OraclePipeline(self.cfg)

    @classmethod
    def from_pretrained(cls, model_id: str | None = None, **kwargs):
        """Reference loader signature (model.py `from_pretrained`); the
        deterministic scorer replaces checkpoint weights, so `model_id`
        is accepted for call-site compatibility and ignored."""
        cfg = kwargs.pop("cfg", None)
        return cls(cfg=cfg)

    # ------------------------------------------------ inference (list path)
    def run(
        self,
        texts: list[str],
        labels: list[str],
        flat_ner: bool = True,
        threshold: float = 0.5,
        multi_label: bool = False,
        **_kwargs,
    ) -> list[list[dict]]:
        """model.py:357 — batch inference; returns per-text entity dicts
        {start, end, text, label, score} with char offsets."""
        return self._oracle.run(
            texts, labels, threshold=threshold, flat_ner=flat_ner,
            multi_label=multi_label,
        )

    def predict_entities(
        self,
        text: str,
        labels: list[str],
        flat_ner: bool = True,
        threshold: float = 0.5,
        multi_label: bool = False,
        **kwargs,
    ) -> list[dict]:
        """model.py:236 — single-text convenience over run()."""
        return self.run(
            [text], labels, flat_ner=flat_ner, threshold=threshold,
            multi_label=multi_label, **kwargs,
        )[0]

    def batch_predict_entities(
        self,
        texts: list[str],
        labels: list[str],
        flat_ner: bool = True,
        threshold: float = 0.5,
        multi_label: bool = False,
        **kwargs,
    ) -> list[list[dict]]:
        """model.py:261 — deprecated alias forwarding to run(), exactly
        like the reference."""
        return self.run(
            texts, labels, flat_ner=flat_ner, threshold=threshold,
            multi_label=multi_label, **kwargs,
        )

    def encode_labels(self, labels: list[str]):
        """model.py:604-630 — pre-encode the label set once (the
        bi-encoder trick this engine broadcasts Spark-side). Returns an
        opaque handle for predict_with_embeds."""
        labels = list(dict.fromkeys(labels))
        return labels, self._oracle.scorer.encode_labels(labels)

    def predict_with_embeds(
        self,
        texts: list[str],
        labels_embeds,
        flat_ner: bool = True,
        threshold: float = 0.5,
        multi_label: bool = False,
        **_kwargs,
    ) -> list[list[dict]]:
        """model.py:451-531 — inference against PRE-ENCODED label
        embeddings (no per-call label re-encoding)."""
        labels, mat = labels_embeds
        return [
            self._oracle._run_one(
                t, labels, mat, threshold, flat_ner, multi_label
            )
            for t in texts
        ]

    # ------------------------------------------- inference (DataFrame path)
    def predict_entities_df(
        self,
        transcripts: DataFrame,
        labels: list[str],
        threshold: float | None = None,
    ) -> DataFrame:
        """Corpus-scale equivalent: transcripts DataFrame → entities
        DataFrame (operators/ner.extract_entities — one narrow mapInArrow
        stage)."""
        from .operators.ner import extract_entities

        return extract_entities(
            transcripts, labels, cfg=self.cfg, threshold=threshold
        )

    def extract_triples_df(
        self,
        transcripts: DataFrame,
        relations: list[str],
        entity_types: list[str],
    ) -> DataFrame:
        """Corpus-scale two-pass relation extraction (operators/relations)."""
        from .operators.relations import extract_triples

        return extract_triples(
            transcripts, relations, entity_types, cfg=self.cfg
        )


class GLiNERRelationExtractor:
    """gliner/multitask/relation_extraction.py parity: __call__(texts,
    relations, entity_types) → per-text triple dicts {source, relation,
    target, score, start, end}."""

    def __init__(self, model: GLiNERSpark | None = None):
        self.model = model or GLiNERSpark()

    def __call__(
        self,
        texts: str | list[str],
        relations: list[str] | None = None,
        entity_types: list[str] | None = None,
        ner_threshold: float = 0.5,
        rel_threshold: float = 0.5,
        **_kwargs,
    ) -> list[list[dict]]:
        if isinstance(texts, str):
            texts = [texts]
        return self.model._oracle.extract_relations(
            texts,
            relations or [],
            entity_types or [],
            ner_threshold=ner_threshold,
            rel_threshold=rel_threshold,
        )


class GLiNERClassifier:
    """gliner/multitask/classification.py parity."""

    def __init__(self, model: GLiNERSpark | None = None):
        self.model = model or GLiNERSpark()
        self._mt = OracleMultitask(self.model._oracle)

    def __call__(
        self, texts: str | list[str], classes: list[str],
        threshold: float = 0.5, **_kwargs,
    ) -> list[dict]:
        if isinstance(texts, str):
            texts = [texts]
        return self._mt.classify(texts, classes, threshold=threshold)


class GLiNERQuestionAnswerer:
    """gliner/multitask/question_answering.py parity."""

    def __init__(self, model: GLiNERSpark | None = None):
        self.model = model or GLiNERSpark()
        self._mt = OracleMultitask(self.model._oracle)

    def __call__(
        self, texts: str | list[str], questions: str | list[str],
        threshold: float = 0.5, **_kwargs,
    ) -> list[list[dict]]:
        if isinstance(texts, str):
            texts = [texts]
        if isinstance(questions, str):
            return self._mt.answer(texts, questions, threshold=threshold)
        return [
            self._mt.answer([t], q, threshold=threshold)[0]
            for t, q in zip(texts, questions)
        ]


class GLiNERSummarizer:
    """gliner/multitask/summarization.py parity."""

    def __init__(self, model: GLiNERSpark | None = None):
        self.model = model or GLiNERSpark()
        self._mt = OracleMultitask(self.model._oracle)

    def __call__(
        self, texts: str | list[str], threshold: float = 0.25, **_kwargs,
    ) -> list[str]:
        if isinstance(texts, str):
            texts = [texts]
        return self._mt.summarize(texts, threshold=threshold)


class GLiNEROpenExtractor:
    """gliner/multitask/open_extraction.py parity."""

    def __init__(self, model: GLiNERSpark | None = None):
        self.model = model or GLiNERSpark()
        self._mt = OracleMultitask(self.model._oracle)

    def __call__(
        self, texts: str | list[str], labels: list[str] | None = None,
        threshold: float = 0.5, **_kwargs,
    ) -> list[list[dict]]:
        if isinstance(texts, str):
            texts = [texts]
        return self._mt.open_extract(
            texts, labels or ["match"], threshold=threshold
        )
