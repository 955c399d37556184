"""Pure-Python end-to-end oracle: the reference pipeline, one text at a time.

Mirrors GLiNER.run (gliner/model.py:357-449):
  tokenize w/ offsets → truncate to max_len → empty-text guard → score all
  (start, width) spans against label embeddings → sigmoid threshold →
  greedy decode → project token spans to char offsets → entity dicts.

And GLiNERRelationExtractor.__call__ (gliner/multitask/relation_extraction.py:113-134):
  NER pass → per-text unique entity surface forms × relations → composite
  labels "ent <> rel" → prompt rewrite → second scoring pass with per-text
  label lists → split on '<>' → (source, relation, target, score) triples.

Deviation from reference, documented: prepare_source_relation uses a Python
`set` for unique entity texts (relation_extraction.py:70) whose iteration
order is hash-dependent; we use first-occurrence order (dict.fromkeys) so
both oracle and Spark pipeline are deterministic. Label ORDER only affects
class ids, which only affects greedy tie-breaks between bit-equal scores.

The pytest P/R≥0.95 gate compares the Spark pipeline's output to THIS module.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig, DEFAULT
from .decode import decode_row
from .scorer import HashedBiEncoder
from .tokenizer import prep_tokens


class OraclePipeline:
    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or DEFAULT
        self.scorer = HashedBiEncoder(self.cfg.scorer)

    # ------------------------------------------------------------- NER pass
    def _prep(self, text: str):
        """Tokenize + truncate + empty guard (processor.py:345-352)."""
        return prep_tokens(text, self.cfg.max_len, self.cfg.tokenizer)

    def run(
        self,
        texts: list[str],
        labels: list[str],
        threshold: float | None = None,
        flat_ner: bool = True,
        multi_label: bool = False,
    ) -> list[list[dict]]:
        """Shared-label NER over texts → list of entity-dict lists
        ({start, end, text, label, score} — char offsets, model.py:436-442).
        """
        thr = self.cfg.threshold if threshold is None else threshold
        labels = list(dict.fromkeys(labels))  # model.py:202
        label_mat = self.scorer.encode_labels(labels)
        out = []
        for text in texts:
            out.append(
                self._run_one(text, labels, label_mat, thr, flat_ner, multi_label)
            )
        return out

    def run_ragged(
        self,
        texts: list[str],
        per_text_labels: list[list[str]],
        threshold: float,
        flat_ner: bool = True,
        multi_label: bool = False,
    ) -> list[list[dict]]:
        """Per-text label lists (processor.py:255-266 branch)."""
        out = []
        for text, labels in zip(texts, per_text_labels):
            labels = list(dict.fromkeys(labels))
            label_mat = self.scorer.encode_labels(labels)
            out.append(
                self._run_one(text, labels, label_mat, threshold, flat_ner, multi_label)
            )
        return out

    def _run_one(self, text, labels, label_mat, threshold, flat_ner, multi_label):
        tokens, starts, ends = self._prep(text)
        if label_mat.shape[0] == 0:
            return []
        ids, _ = self.scorer.ids_matrix([tokens])
        probs = self.scorer.score_batch(ids, label_mat, self.cfg.max_width)[0]
        s, e, c, sc = decode_row(
            probs, len(tokens), threshold, flat_ner=flat_ner, multi_label=multi_label
        )
        ents = []
        for si, ei, ci, sci in zip(s, e, c, sc):
            cs, ce = starts[int(si)], ends[int(ei)]
            ents.append(
                {
                    "start": cs,
                    "end": ce,
                    "text": text[cs:ce],
                    "label": labels[int(ci)],
                    "score": float(sci),
                }
            )
        return ents

    # ------------------------------------------------------ token-level NER
    def run_token(
        self,
        texts: list[str],
        labels: list[str],
        threshold: float | None = None,
        flat_ner: bool = True,
        multi_label: bool = False,
    ) -> list[list[dict]]:
        """Token-level decode path (reference TokenProcessor/TokenDecoder,
        decoder.py:130-170): start/end/inside scores per (token, class),
        start×end pair join, min-score spans, greedy non-overlap."""
        from .decode import decode_row_token

        thr = self.cfg.threshold if threshold is None else threshold
        labels = list(dict.fromkeys(labels))
        label_mat = self.scorer.encode_labels(labels)
        out = []
        for text in texts:
            tokens, starts, ends = self._prep(text)
            if label_mat.shape[0] == 0:
                out.append([])
                continue
            ids, _ = self.scorer.ids_matrix([tokens])
            probs = self.scorer.token_scores(ids, label_mat)[0]
            spans = decode_row_token(
                probs, len(tokens), thr, flat_ner=flat_ner,
                multi_label=multi_label,
            )
            ents = []
            for si, ei, ci, sci in spans:
                cs, ce = starts[si], ends[ei]
                ents.append(
                    {
                        "start": cs,
                        "end": ce,
                        "text": text[cs:ce],
                        "label": labels[ci],
                        "score": float(sci),
                    }
                )
            out.append(ents)
        return out

    # -------------------------------------------------------- relation pass
    def unique_entity_texts(self, entities: list[dict]) -> list[str]:
        """First-occurrence-ordered unique surface forms (see module note)."""
        return list(dict.fromkeys(ent["text"] for ent in entities))

    def relation_labels(self, entities: list[dict], relations: list[str]) -> list[str]:
        """Composite labels, relation-major × entity-minor
        (relation_extraction.py:66-75 loop order)."""
        uniq = self.unique_entity_texts(entities)
        return [f"{ent} <> {rel}" for rel in relations for ent in uniq]

    def extract_relations(
        self,
        texts: list[str],
        relations: list[str],
        entity_types: list[str],
        ner_threshold: float | None = None,
        rel_threshold: float | None = None,
    ) -> list[list[dict]]:
        """Two-pass triple extraction (relation_extraction.py:113-134)."""
        cfg = self.cfg
        ner_thr = cfg.ner_threshold if ner_threshold is None else ner_threshold
        rel_thr = cfg.rel_threshold if rel_threshold is None else rel_threshold
        ner_preds = self.run(texts, entity_types, threshold=ner_thr)
        per_text_labels = [self.relation_labels(p, relations) for p in ner_preds]
        prompts = [f"{cfg.re_prompt} \n {t}" for t in texts]
        rel_preds = self.run_ragged(prompts, per_text_labels, rel_thr)
        shift = len(cfg.re_prompt) + len(" \n ")
        out = []
        for preds in rel_preds:
            triples = []
            for t in preds:
                # rsplit mirrors operators/relations.py: entity surfaces
                # may contain '<>', relation names never do
                source, rel_label = t["label"].rsplit("<>", 1)
                triples.append(
                    {
                        "source": source.strip(),
                        "relation": rel_label.strip(),
                        "target": t["text"].strip(),
                        "score": t["score"],
                        "start": t["start"] - shift,
                        "end": t["end"] - shift,
                    }
                )
            out.append(triples)
        return out
