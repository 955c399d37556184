"""Pipeline configuration.

Field defaults mirror the reference's capacity knobs so decode semantics
line up (reference: gliner/config.py:13 max_width=12, :26 max_len=384,
inference threshold=0.5 at gliner/model.py:352-356).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

# the reference span-rep registry (gliner/modeling/span_rep.py:381-421);
# this engine's deterministic scorer realizes ALL 11 registry modes
# (kernel/scorer.py _width_reps); unknown names are rejected loudly
SPAN_MODES_REFERENCE = (
    "markerV0", "marker", "markerV1", "query", "mlp", "cat", "conv_conv",
    "conv_max", "conv_mean", "conv_sum", "conv_share",
)
SPAN_MODES_IMPLEMENTED = SPAN_MODES_REFERENCE


@dataclass(frozen=True)
class ScorerConfig:
    """Deterministic numpy bi-encoder (torch-free stand-in for the
    reference's DeBERTa bi-encoder; same tensor contract, see SURVEY §7.0).

    The scorer is intentionally seeded + hash-based so the Spark pipeline
    and the pure-Python oracle produce bit-identical scores.
    """

    dim: int = 64
    buckets: int = 1 << 16
    seed: int = 42
    # logit = alpha * sqrt(dim) * cosine(span_rep, label_emb) + beta
    # calibrated so ~1-3% of span×label cells clear sigmoid>0.5
    alpha: float = 2.0
    beta: float = -4.0
    # token-level scorer: logit = token_alpha * z + token_beta over the
    # vocab-standardized channel; spans need start ∧ end ∧ all-inside
    # above threshold, so per-role fire rates are kept moderate (~18%)
    token_alpha: float = 1.5
    token_beta: float = -1.4
    # span representation head (reference span_rep.py registry); decides
    # how (start, width) span reps are built before label scoring
    span_mode: str = "markerV0"

    def __post_init__(self) -> None:
        if self.span_mode not in SPAN_MODES_IMPLEMENTED:
            raise ValueError(
                f"span_mode={self.span_mode!r} not implemented; "
                f"choose one of {SPAN_MODES_IMPLEMENTED}"
            )


@dataclass(frozen=True)
class PipelineConfig:
    max_width: int = 12          # reference gliner/config.py:13
    max_len: int = 384           # reference gliner/config.py:26
    threshold: float = 0.5       # reference gliner/model.py:352-356
    flat_ner: bool = True
    multi_label: bool = False
    # tokenizer registry name (kernel/tokenizer.py SPLITTERS — mirrors
    # reference WordsSplitter, tokenizer.py:269-296); whitespace default
    # keeps fixture parity, 'cjk'/'universal' fix han-run clumping
    tokenizer: str = "whitespace"
    # span representation mode (markerV0 / marker / mlp implemented;
    # other registry names are validated-rejected below). Mirrored into
    # scorer.span_mode in __post_init__ so both the Spark operators and
    # the pure-Python oracle score with the same head.
    span_mode: str = "markerV0"
    # relation pass (reference gliner/multitask/relation_extraction.py:30,85)
    re_prompt: str = "Extract relationships between entities from the text: "
    ner_threshold: float = 0.5
    rel_threshold: float = 0.5
    # entity linking
    minhash_perms: int = 64
    lsh_bands: int = 16          # 16 bands × 4 rows
    shingle_size: int = 3
    jaccard_threshold: float = 0.6
    # canonicalization links NAME-like surfaces (≤ this many tokens);
    # longer spans pass through as their own canonical form — linking
    # every 12-token span surface is a different (and quadratically
    # blowing-up) workload than entity linking
    link_max_tokens: int = 3
    # turn-window relation scoping (SURVEY §2.5 W4)
    turn_window: int = 2
    scorer: ScorerConfig = field(default_factory=ScorerConfig)

    def __post_init__(self) -> None:
        from .kernel.tokenizer import SPLITTERS

        if self.span_mode not in SPAN_MODES_IMPLEMENTED:
            known = (
                "a reference span mode (span_rep.py:381-421) not "
                "implemented by this engine"
                if self.span_mode in SPAN_MODES_REFERENCE
                else "not a reference span mode at all"
            )
            raise ValueError(
                f"span_mode={self.span_mode!r} is {known}; "
                f"implemented: {SPAN_MODES_IMPLEMENTED}"
            )
        if self.tokenizer not in SPLITTERS:
            raise ValueError(
                f"tokenizer={self.tokenizer!r} is not registered; "
                f"choose one of {sorted(SPLITTERS)}"
            )
        if self.scorer.span_mode != self.span_mode:
            object.__setattr__(
                self, "scorer", replace(self.scorer, span_mode=self.span_mode)
            )


DEFAULT = PipelineConfig()
