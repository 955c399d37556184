"""Span-based zero-shot NER as a single shuffle-free mapInArrow stage.

Spark-first restatement of the reference inference query
(GLiNER.run, gliner/model.py:357-449 — lifecycle in SURVEY §3.1):

 - the label-embedding matrix is computed ONCE on the driver and shipped in
   the UDF closure — the reference's bi-encoder label pre-encoding trick
   (gliner/model.py:604-630) expressed as Spark's broadcast pattern;
 - tokenization, span-rep construction and the span×label matmul run
   vectorized per Arrow batch (reference einsum at modeling/base.py:547);
 - threshold → greedy non-overlap decode per row (decoder.py:54-128);
 - char-offset projection + span text slicing (model.py:429-447).

The whole stage is NARROW: no shuffle between the transcript scan and the
entities output. At 100 TB this is the property that matters — scoring
cost scales linearly with input splits and AQE/partition sizing is the
only tuning surface. Catalyst pushes the column prune (only key cols +
text are read from parquet/Iceberg) because mapInArrow declares its input
projection explicitly via the upstream select.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import PipelineConfig, DEFAULT
from ..kernel.decode import decode_batch
from ..kernel.scorer import HashedBiEncoder, get_scorer
from ..kernel.tokenizer import prep_tokens

_ENTITY_FIELDS = [
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("tok_start", T.IntegerType(), False),
    T.StructField("tok_end", T.IntegerType(), False),
]

_ENTITY_ARROW_FIELDS = [
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("text", pa.string()),
    ("label", pa.string()),
    ("score", pa.float64()),
    ("tok_start", pa.int32()),
    ("tok_end", pa.int32()),
]

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        *_ENTITY_FIELDS,
    ]
)

# dense working-set budget for one scoring chunk: B*Lmax*K*(dim+C) float32s
_CHUNK_BUDGET_ELEMS = 6_000_000  # ~24 MB of float32 working set


def _chunk_rows(lengths: list[int], max_width: int, dim: int, n_labels: int):
    """Greedy chunking so the padded (B, Lmax, K, dim+C) tensor stays under
    budget regardless of text length mix."""
    per_tok = max_width * (dim + max(n_labels, 1))
    chunks: list[tuple[int, int]] = []
    i, n = 0, len(lengths)
    while i < n:
        lmax = 1
        j = i
        while j < n:
            lmax_new = max(lmax, lengths[j])
            if (j - i + 1) * lmax_new * per_tok > _CHUNK_BUDGET_ELEMS and j > i:
                break
            lmax = lmax_new
            j += 1
        chunks.append((i, j))
        i = j
    return chunks


def _score_and_decode_batch(
    texts: list[str],
    scorer: HashedBiEncoder,
    label_mat: np.ndarray,
    labels: list[str],
    cfg: PipelineConfig,
    threshold: float,
    prepped: list[tuple] | None = None,
):
    """Shared-label scoring of one list of texts → per-text entity tuples
    (char_start, char_end, span_text, label, score, tok_start, tok_end).

    `prepped` lets callers share tokenization across passes (the fused RE
    operator tokenizes each text once for both passes)."""
    if prepped is None:
        prepped = [prep_tokens(t, cfg.max_len, cfg.tokenizer) for t in texts]
    lengths = [len(p[0]) for p in prepped]
    out: list[list[tuple]] = [None] * len(texts)  # type: ignore[list-item]
    # chunk in LENGTH-SORTED order: padding in an arrival-order chunk is
    # set by its longest row (measured 2.0× padded-FLOP waste on the
    # transcript length mix vs 1.05× sorted). Scores are padding-
    # independent (vocab-level tables — gathers + adds), so ordering
    # cannot perturb values; results scatter back by original index.
    order = sorted(range(len(texts)), key=lambda i: lengths[i])
    sorted_lengths = [lengths[i] for i in order]
    for lo, hi in _chunk_rows(
        sorted_lengths, cfg.max_width, scorer.cfg.dim, len(labels)
    ):
        idx = order[lo:hi]
        ids, _ = scorer.ids_matrix([prepped[i][0] for i in idx])
        probs = scorer.score_batch(ids, label_mat, cfg.max_width)
        decoded = decode_batch(
            probs,
            np.asarray(sorted_lengths[lo:hi], dtype=np.int64),
            threshold,
            flat_ner=cfg.flat_ner,
            multi_label=cfg.multi_label,
        )
        for bi, i in enumerate(idx):
            tokens, tstarts, tends = prepped[i]
            text = texts[i]
            rows = []
            for si, ei, ci, sci in decoded[bi]:
                cs, ce = tstarts[si], tends[ei]
                rows.append(
                    (cs, ce, text[cs:ce], labels[ci], float(sci), si, ei)
                )
            out[i] = rows
    return out


def extract_entities_token(
    transcripts: DataFrame,
    labels: list[str],
    cfg: PipelineConfig | None = None,
    threshold: float | None = None,
    passthrough: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Token-level decode variant (reference TokenProcessor/TokenDecoder
    family — SURVEY §2.2 P5-token, §2.3 J3 start×end pair join, §2.4 A4
    min-over-parts span score). Same narrow mapInArrow shape as
    extract_entities; only the scoring tensor (B, L, C, 3) and the decode
    rule differ. Config flag equivalent of the reference's processor
    hierarchy choice (processor.py:297 vs :486)."""
    from ..kernel.decode import decode_row_token

    cfg = cfg or DEFAULT
    thr = cfg.threshold if threshold is None else threshold
    labels = list(dict.fromkeys(labels))
    label_mat = get_scorer(cfg.scorer).encode_labels(labels)
    passthrough = tuple(passthrough)
    in_fields = {f.name: f for f in transcripts.schema.fields}
    out_schema = T.StructType(
        [in_fields[c] for c in passthrough] + _ENTITY_FIELDS
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        scorer = get_scorer(cfg.scorer)
        for batch in batches:
            texts = batch.column("text").to_pylist()
            prepped = [prep_tokens(t, cfg.max_len, cfg.tokenizer) for t in texts]
            lengths = [len(p[0]) for p in prepped]
            idx: list[int] = []
            cols: dict[str, list] = {n: [] for n, _t in _ENTITY_ARROW_FIELDS}
            # length-sorted chunking (see _score_and_decode_batch): spans
            # scatter into per-row slots so emission order stays the
            # original row order
            per_row: list[list] = [None] * len(texts)  # type: ignore[list-item]
            order = sorted(range(len(texts)), key=lambda i: lengths[i])
            sorted_lengths = [lengths[i] for i in order]
            # chunk budget: (B, Lmax) × (3·C + dim) working floats per token
            for lo, hi in _chunk_rows(
                sorted_lengths, 3, scorer.cfg.dim, len(labels)
            ):
                rows_idx = order[lo:hi]
                ids, _ = scorer.ids_matrix([prepped[i][0] for i in rows_idx])
                probs = scorer.token_scores(ids, label_mat)
                for bi, i in enumerate(rows_idx):
                    tokens, tstarts, tends = prepped[i]
                    per_row[i] = decode_row_token(
                        probs[bi],
                        len(tokens),
                        thr,
                        flat_ner=cfg.flat_ner,
                        multi_label=cfg.multi_label,
                    )
            for i, spans in enumerate(per_row):
                tokens, tstarts, tends = prepped[i]
                text = texts[i]
                for si, ei, ci, sci in spans:
                    cs, ce = tstarts[si], tends[ei]
                    idx.append(i)
                    cols["start"].append(cs)
                    cols["end"].append(ce)
                    cols["text"].append(text[cs:ce])
                    cols["label"].append(labels[ci])
                    cols["score"].append(float(sci))
                    cols["tok_start"].append(si)
                    cols["tok_end"].append(ei)
            take = pa.array(idx, type=pa.int64())
            arrays = [batch.column(c).take(take) for c in passthrough] + [
                pa.array(cols[n], type=t) for n, t in _ENTITY_ARROW_FIELDS
            ]
            names = list(passthrough) + [n for n, _t in _ENTITY_ARROW_FIELDS]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    projected = transcripts.select(*passthrough, "text")
    return projected.mapInArrow(run, out_schema)


def extract_entities(
    transcripts: DataFrame,
    labels: list[str],
    cfg: PipelineConfig | None = None,
    threshold: float | None = None,
    passthrough: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """transcripts(…, text) → entities DataFrame.

    Narrow transformation; output partitioning inherits the scan. Labels
    are deduped order-preserving (reference gliner/model.py:202).

    `passthrough` columns are carried into the output untouched via Arrow
    `take` (zero-copy gather of the input arrays, any type incl. ts) —
    consumers that need e.g. the event timestamp (streaming windows) list
    it here instead of joining back.
    """
    cfg = cfg or DEFAULT
    thr = cfg.threshold if threshold is None else threshold
    labels = list(dict.fromkeys(labels))
    # Driver-side label pre-encoding; the (C, dim) matrix rides the closure
    # (tiny) — semantically a broadcast of the build side of the span×label
    # cross-score join (SURVEY §2.3 J1).
    label_mat = get_scorer(cfg.scorer).encode_labels(labels)
    passthrough = tuple(passthrough)

    in_fields = {f.name: f for f in transcripts.schema.fields}
    out_schema = T.StructType(
        [in_fields[c] for c in passthrough] + _ENTITY_FIELDS
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        scorer = get_scorer(cfg.scorer)  # per-worker memoized, deterministic
        for batch in batches:
            texts = batch.column("text").to_pylist()
            per_row = _score_and_decode_batch(
                texts, scorer, label_mat, labels, cfg, thr
            )
            idx: list[int] = []
            cols: dict[str, list] = {n: [] for n, _t in _ENTITY_ARROW_FIELDS}
            for i, rows in enumerate(per_row):
                for cs, ce, sp, lb, sc, ts_, te_ in rows:
                    idx.append(i)
                    cols["start"].append(cs)
                    cols["end"].append(ce)
                    cols["text"].append(sp)
                    cols["label"].append(lb)
                    cols["score"].append(sc)
                    cols["tok_start"].append(ts_)
                    cols["tok_end"].append(te_)
            take = pa.array(idx, type=pa.int64())
            arrays = [batch.column(c).take(take) for c in passthrough] + [
                pa.array(cols[n], type=t) for n, t in _ENTITY_ARROW_FIELDS
            ]
            names = list(passthrough) + [n for n, _t in _ENTITY_ARROW_FIELDS]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    projected = transcripts.select(*passthrough, "text")
    return projected.mapInArrow(run, out_schema)
