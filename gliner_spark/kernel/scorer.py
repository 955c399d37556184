"""Deterministic numpy bi-encoder scorer.

Stand-in for the reference's transformer bi-encoder (torch/transformers are
not installed in this environment). Same tensor contract as the reference:

  token embeddings ─► span reps (markerV0 shape: start-proj ⊕ end-proj,
  reference gliner/modeling/span_rep.py:262-286) ─► scores against label
  embeddings via a batched matmul (reference einsum "BLKD,BCD->BLKC" at
  gliner/modeling/base.py:547) ─► sigmoid (gliner/decoding/decoder.py:81).

Label embeddings are mean-pooled token vectors (reference
gliner/modeling/encoder.py:169-171), computed ONCE and broadcast — the
reference's bi-encoder label pre-encoding trick (gliner/model.py:604-630).

Determinism: token → embedding row via crc32 hashing into a seeded random
matrix; all projection matrices are seeded. The Spark mapInArrow stage and
the pure-Python oracle import THIS class, so scores are bit-identical and
any P/R loss isolates pipeline plumbing bugs, not model noise.

Everything is vectorized over Arrow-batch-shaped inputs: (B, Lmax) padded
token-id matrices. No per-row Python in the scoring path.
"""

from __future__ import annotations

import math
import zlib
from collections import OrderedDict

import numpy as np

from ..config import ScorerConfig
from .tokenizer import TOKEN_RE

_EPS = 1e-8


def stable_token_id(token: str, buckets: int) -> int:
    """crc32-based stable hash (Python's hash() is salted per process).

    Case-SENSITIVE, like the reference's DeBERTa tokenizer: distinct
    surface casings must get distinct embeddings, otherwise bit-equal
    label vectors create score ties whose resolution depends on BLAS
    column blocking (batch-shape dependent) rather than on semantics.
    """
    return zlib.crc32(token.encode("utf-8")) % buckets


class HashedBiEncoder:
    def __init__(self, cfg: ScorerConfig | None = None):
        self.cfg = cfg or ScorerConfig()
        c = self.cfg
        rng = np.random.RandomState(c.seed)
        scale = 1.0 / math.sqrt(c.dim)
        self.emb = (rng.standard_normal((c.buckets, c.dim)) * scale).astype(np.float32)
        w_start = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        w_end = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        self.w_label = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        # Pre-project the whole vocab once: downstream batch scoring is then
        # gathers + adds only, so padded batch shape cannot perturb values.
        self.start_table = self.emb @ w_start  # (buckets, dim)
        self.end_table = self.emb @ w_end      # (buckets, dim)
        self._label_cache: dict[str, np.ndarray] = {}
        self._labelset_cache: OrderedDict[tuple[str, ...], np.ndarray] = (
            OrderedDict()
        )
        self._labelset_bytes = 0
        self._tok_cache: dict[str, int] = {}
        # token-level scorer parameters (reference Scorer,
        # modeling/scorers.py:4-35: two-way token/label projections, a
        # concat(token0, label0, token0⊙label0-style interaction) MLP to 3
        # scores per (token, class): start/end/inside)
        wt0 = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        wt1 = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        # (the reference Scorer also projects the label through a second
        # head whose contribution is constant per (class, role); under the
        # vocab standardization in token_scores it cancels exactly, so it
        # is not materialized here)
        self.wl1 = (rng.standard_normal((c.dim, c.dim)) * scale).astype(np.float32)
        self.out_a = (rng.standard_normal((c.dim, 3)) * scale).astype(np.float32)
        self.out_c = (rng.standard_normal((c.dim, 3)) * scale).astype(np.float32)
        self.tok0_table = np.tanh(self.emb @ wt0)  # (buckets, dim)
        self.tok1_table = np.tanh(self.emb @ wt1)
        self.tok0_out = self.tok0_table @ self.out_a  # (buckets, 3)
        self._token_stats: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}
        # lazily-built span-rep mode tables (marker / mlp); separate rng
        # streams so the draw order above (and thus markerV0 values)
        # never shifts when a mode is added
        self._marker_tabs: tuple[np.ndarray, np.ndarray] | None = None
        self._mlp_tabs: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ ids
    _TOK_CACHE_MAX = 1 << 20  # memo cap; beyond it, compute without insert

    def token_ids(self, tokens: list[str]) -> np.ndarray:
        b = self.cfg.buckets
        cache = self._tok_cache
        out = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = zlib.crc32(t.encode("utf-8")) % b
                if len(cache) < self._TOK_CACHE_MAX:
                    cache[t] = v
            out[i] = v
        return out

    def ids_matrix(self, token_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
        """Pad a batch of token lists → (ids (B, Lmax) int64, lengths (B,))."""
        lengths = np.array([len(t) for t in token_lists], dtype=np.int64)
        lmax = int(lengths.max()) if len(lengths) else 0
        ids = np.zeros((len(token_lists), max(lmax, 1)), dtype=np.int64)
        for i, toks in enumerate(token_lists):
            if toks:
                ids[i, : len(toks)] = self.token_ids(toks)
        return ids, lengths

    # --------------------------------------------------------------- labels
    def encode_label(self, label: str) -> np.ndarray:
        cached = self._label_cache.get(label)
        if cached is not None:
            return cached
        toks = TOKEN_RE.findall(label)
        if not toks:
            vec = np.zeros(self.cfg.dim, dtype=np.float32)
        else:
            mean = self.emb[self.token_ids(toks)].mean(axis=0)
            vec = np.tanh(mean @ self.w_label)
            vec = vec / (np.linalg.norm(vec) + _EPS)
        vec.setflags(write=False)  # cached object is shared — freeze it
        self._label_cache[label] = vec
        return vec

    _LABELSET_CACHE_MAX_BYTES = 64 << 20  # per python worker process

    def encode_labels(self, labels: list[str]) -> np.ndarray:
        """(C, dim) float32, one normalized vector per label.

        Memoized at the label-SET level too: the RE pass encodes one
        composite-label list per row and the same (entity, relation)
        combinations recur constantly, so the per-row lookup+stack was a
        measurable slice of batch wall time. Values are byte-identical to
        the uncached path — each label vector still comes from the same
        per-label computation (no batch-shape-dependent BLAS path).

        The returned matrix is the CACHED object, frozen read-only
        (setflags) so a caller mutating it gets an immediate error
        instead of silently corrupting every later lookup. The cache is
        a byte-bounded LRU — varied RE composite-label sets must not pin
        unbounded memory in long-lived workers (ADVICE r02)."""
        if not labels:
            return np.zeros((0, self.cfg.dim), dtype=np.float32)
        key = tuple(labels)
        cached = self._labelset_cache.get(key)
        if cached is not None:
            self._labelset_cache.move_to_end(key)  # LRU touch
            return cached
        mat = np.stack([self.encode_label(lb) for lb in labels])
        mat.setflags(write=False)
        self._labelset_cache[key] = mat
        self._labelset_bytes += mat.nbytes
        while self._labelset_bytes > self._LABELSET_CACHE_MAX_BYTES:
            _, old = self._labelset_cache.popitem(last=False)
            self._labelset_bytes -= old.nbytes
        return mat

    # -------------------------------------------------------------- scoring
    def _span_vecs_from(
        self, start_table: np.ndarray, end_table: np.ndarray,
        ids: np.ndarray, max_width: int,
    ):
        """(s_vec (B,L,d), e_pad (B,L+K-1,d)): e_pad lets every width-k
        shift be a zero-copy VIEW e_pad[:, k:k+L]. Positions past the
        padded edge reuse the last column (such spans always fail the
        end<=len rule at decode, mirroring decoder.py:110-112, so the
        filler never reaches output)."""
        s_vec = start_table[ids]  # (B, L, d)
        e_vec = end_table[ids]
        if max_width > 1:
            pad = np.broadcast_to(
                e_vec[:, -1:, :], (e_vec.shape[0], max_width - 1, e_vec.shape[2])
            )
            e_pad = np.concatenate([e_vec, pad], axis=1)
        else:
            e_pad = e_vec
        return s_vec, e_pad

    def _span_vecs(self, ids: np.ndarray, max_width: int):
        return self._span_vecs_from(
            self.start_table, self.end_table, ids, max_width
        )

    # ----------------------------------------------- span-rep mode heads
    def _marker_tables(self):
        """Vocab-level fold of the reference SpanMarker head
        (span_rep.py:216-259): two endpoint MLPs (d→2d→relu→d), concat,
        relu, out-projection (2d→d). relu(cat(a, b)) @ W_out splits into
        relu(a) @ W_top + relu(b) @ W_bot, so the whole head collapses to
        two per-vocab tables — scoring stays gathers + adds, bit-stable
        across batch shapes like the markerV0 tables (dropout = identity
        at inference). Built lazily on first marker-mode use."""
        if self._marker_tabs is None:
            c = self.cfg
            scale = 1.0 / math.sqrt(c.dim)
            rng = np.random.RandomState(c.seed + 101)

            def endpoint_mlp() -> np.ndarray:
                w1 = (rng.standard_normal((c.dim, 2 * c.dim)) * scale).astype(
                    np.float32
                )
                w2 = (rng.standard_normal((2 * c.dim, c.dim)) * scale).astype(
                    np.float32
                )
                return np.maximum(self.emb @ w1, 0.0) @ w2

            sa, se = endpoint_mlp(), endpoint_mlp()
            w_top = (rng.standard_normal((c.dim, c.dim)) * scale).astype(
                np.float32
            )
            w_bot = (rng.standard_normal((c.dim, c.dim)) * scale).astype(
                np.float32
            )
            self._marker_tabs = (
                np.maximum(sa, 0.0) @ w_top,
                np.maximum(se, 0.0) @ w_bot,
            )
        return self._marker_tabs

    def _mlp_table(self, k: int) -> np.ndarray:
        """Vocab-level width-k slice of the reference SpanMLP head
        (span_rep.py:33-50: one Linear d→K·d, reshape (B,L,K,d), relu):
        the rep of span (s, s+k) is a function of token s ONLY. One
        (buckets, d) table per width, built lazily — vocab-level
        pre-projection keeps values independent of batch shape."""
        t = self._mlp_tabs.get(k)
        if t is None:
            c = self.cfg
            scale = 1.0 / math.sqrt(c.dim)
            rng = np.random.RandomState(c.seed + 211 + k)
            wk = (rng.standard_normal((c.dim, c.dim)) * scale).astype(
                np.float32
            )
            t = np.maximum(self.emb @ wk, 0.0)
            self._mlp_tabs[k] = t
        return t

    def _width_reps(self, ids: np.ndarray, max_width: int):
        """Yield the UNNORMALIZED (B, L, d) span rep per width k — the one
        place that realizes the implemented span_mode registry entries
        (markerV0 / marker / mlp). Yielded buffers may be reused between
        iterations; consumers must finish with a buffer before advancing."""
        mode = self.cfg.span_mode
        if mode == "mlp":
            for k in range(max_width):
                yield self._mlp_table(k)[ids]
            return
        if mode == "marker":
            ta, tb = self._marker_tables()
            s_vec, e_pad = self._span_vecs_from(ta, tb, ids, max_width)
            B, L, d = s_vec.shape
            tmp = np.empty((B, L, d), dtype=np.float32)
            for k in range(max_width):
                np.add(s_vec, e_pad[:, k : k + L], out=tmp)
                yield tmp
            return
        # markerV0: rep = tanh(start_proj(tok s) + end_proj(tok s+k))
        s_vec, e_pad = self._span_vecs(ids, max_width)
        B, L, d = s_vec.shape
        tmp = np.empty((B, L, d), dtype=np.float32)
        for k in range(max_width):
            np.add(s_vec, e_pad[:, k : k + L], out=tmp)
            np.tanh(tmp, out=tmp)
            yield tmp

    def span_reps(self, ids: np.ndarray, max_width: int) -> np.ndarray:
        """Normalized span reps (B, L, K, dim) for spans (s, s+k) under
        the configured span_mode. Kept for introspection/tests; the
        scoring fast path below never materializes this 4-D tensor."""
        B, L = ids.shape
        rep = np.empty((B, L, max_width, self.cfg.dim), dtype=np.float32)
        for k, tmp in enumerate(self._width_reps(ids, max_width)):
            rep[:, :, k, :] = tmp
        rep /= np.linalg.norm(rep, axis=-1, keepdims=True) + _EPS
        return rep

    def score_batch(
        self, ids: np.ndarray, label_mat: np.ndarray, max_width: int
    ) -> np.ndarray:
        """Shared-label scoring: probs (B, L, K, C).

        One matmul per width — the broadcast-join pattern (SURVEY §2.3 J1):
        label_mat is the broadcast side, span reps the streamed side. The
        per-width loop works on (B, L, d) slices (views of e_pad), keeping
        the live working set at O(B·L·d) instead of O(B·L·K·d).
        """
        c = self.cfg
        B, L = ids.shape
        d = c.dim
        labT = np.ascontiguousarray(label_mat.T, dtype=np.float32)
        C = labT.shape[1]
        scale = np.float32(c.alpha * math.sqrt(c.dim))
        out = np.empty((B, L, max_width, C), dtype=np.float32)
        for k, tmp in enumerate(self._width_reps(ids, max_width)):
            nrm = np.sqrt(np.einsum("bld,bld->bl", tmp, tmp)) + _EPS
            lg = np.ascontiguousarray(tmp).reshape(B * L, d) @ labT
            lg = lg.reshape(B, L, C)
            lg *= (scale / nrm)[:, :, None]
            lg += np.float32(c.beta)
            out[:, :, k, :] = lg
        return _sigmoid(out)

    def score_batch_ragged(
        self,
        ids: np.ndarray,
        label_mats: list[np.ndarray],
        max_width: int,
    ) -> np.ndarray:
        """Per-row label sets (RE pass, processor.py:255-266 semantics).

        Pads labels to Cmax and runs one einsum per width — the
        reference's padding trick (gliner/modeling/base.py:537-543) with
        the same per-width view structure as score_batch. Padded label
        slots score sigmoid(beta) ≈ 0 (zero vectors), and decode
        additionally bounds c by the per-row label count.
        """
        c = self.cfg
        B = ids.shape[0]
        cmax = max((m.shape[0] for m in label_mats), default=0)
        if cmax == 0:
            return np.zeros((B, ids.shape[1], max_width, 0), dtype=np.float32)
        lab = np.zeros((B, cmax, c.dim), dtype=np.float32)
        for i, m in enumerate(label_mats):
            if m.shape[0]:
                lab[i, : m.shape[0], :] = m
        B, L = ids.shape
        scale = np.float32(c.alpha * math.sqrt(c.dim))
        labT = np.ascontiguousarray(lab.transpose(0, 2, 1))  # (B, d, C)
        out = np.empty((B, L, max_width, cmax), dtype=np.float32)
        for k, tmp in enumerate(self._width_reps(ids, max_width)):
            nrm = np.sqrt(np.einsum("bld,bld->bl", tmp, tmp)) + _EPS
            lg = np.matmul(tmp, labT)  # batched gemm (B,L,d)@(B,d,C)
            lg *= (scale / nrm)[:, :, None]
            lg += np.float32(c.beta)
            out[:, :, k, :] = lg
        return _sigmoid(out)


    # ------------------------------------------------------- token scoring
    def token_scores(
        self, ids: np.ndarray, label_mat: np.ndarray
    ) -> np.ndarray:
        """Token-level probs (B, L, C, 3): sigmoid scores per (token,
        class) for the three position roles (start, end, inside) — the
        reference's Scorer output contract (modeling/scorers.py:18-35),
        deterministic-numpy edition:

          logit[b,l,c,:] = t0[b,l]·A + l0[c]·B + (t1[b,l] ⊙ l1[c])·C

        with the same alpha/beta calibration as the span scorer.
        """
        c = self.cfg
        t1 = self.tok1_table[ids]
        l1 = np.tanh(label_mat @ self.wl1)  # (C, d)
        B, L, d = t1.shape
        C = label_mat.shape[0]
        base_tok = self.tok0_out[ids].reshape(B * L, 3)  # (B·L, 3)
        out = np.empty((B, L, C, 3), dtype=np.float32)
        t1_flat = t1.reshape(B * L, d)
        alpha_t = np.float32(c.token_alpha)
        beta_t = np.float32(c.token_beta)
        for ci in range(C):
            m = l1[ci][:, None] * self.out_c  # (d, 3)
            # per-(class, role) calibration against the FULL vocabulary
            # distribution — random projections otherwise leave a constant
            # per-role bias that the logit scale amplifies into dead or
            # saturated channels. Deterministic, input-independent, cached.
            key = l1[ci].tobytes()
            stats = self._token_stats.get(key)
            if stats is None:
                vocab = self.tok0_out + self.tok1_table @ m  # (buckets, 3)
                stats = (
                    vocab.mean(axis=0),
                    vocab.std(axis=0) + np.float32(_EPS),
                )
                self._token_stats[key] = stats
            mu, sd = stats
            inter = t1_flat @ m  # (B·L, 3)
            z = (base_tok + inter - mu) / sd
            out[:, :, ci, :] = (alpha_t * z + beta_t).reshape(B, L, 3)
        return _sigmoid(out)


_SCORER_CACHE: dict[ScorerConfig, "HashedBiEncoder"] = {}


def get_scorer(cfg: ScorerConfig | None = None) -> "HashedBiEncoder":
    """Per-process memoized scorer — executors build the hashed embedding
    tables once per python worker, not once per task."""
    cfg = cfg or ScorerConfig()
    inst = _SCORER_CACHE.get(cfg)
    if inst is None:
        inst = HashedBiEncoder(cfg)
        _SCORER_CACHE[cfg] = inst
    return inst


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=np.float32)
    np.negative(x, out=out)
    np.exp(out, out=out)
    out += 1.0
    np.reciprocal(out, out=out)
    return out
