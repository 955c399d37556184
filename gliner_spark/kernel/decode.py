"""Span decoding: threshold → candidates → greedy non-overlap selection.

Reference semantics reproduced exactly:
 - candidate enumeration is row-major (start, width, class) order, the
   torch.where order of gliner/decoding/decoder.py:108;
 - spans with end > len(tokens) are skipped (decoder.py:110-112);
 - greedy_search (decoder.py:31-51): stable sort by score desc over the
   candidate order above, accept iff no conflict with an already-accepted
   span, finally stable sort by start;
 - conflict predicates from gliner/decoding/utils.py:1-20
   (flat: any boundary overlap; nested: overlap unless one nests the other;
   equal boundaries conflict unless multi_label).

Two implementations:
 - greedy_search_reference: literal list-based re-statement of the
   reference algorithm (the property-test oracle);
 - greedy_select: numpy-vectorized equivalent used in the hot path on both
   the Spark executors and the pipeline oracle.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- reference form


def _is_nested(a, b) -> bool:
    return (a[0] <= b[0] and a[1] >= b[1]) or (b[0] <= a[0] and b[1] >= a[1])


def has_overlapping(a, b, multi_label: bool = False) -> bool:
    """Flat-NER conflict (gliner/decoding/utils.py:5-11)."""
    if (a[0], a[1]) == (b[0], b[1]):
        return not multi_label
    if a[0] > b[1] or b[0] > a[1]:
        return False
    return True


def has_overlapping_nested(a, b, multi_label: bool = False) -> bool:
    """Nested-NER conflict (gliner/decoding/utils.py:14-20)."""
    if (a[0], a[1]) == (b[0], b[1]):
        return not multi_label
    if (a[0] > b[1] or b[0] > a[1]) or _is_nested(a, b):
        return False
    return True


def greedy_search_reference(spans, flat_ner=True, multi_label=False):
    """Literal restatement of gliner/decoding/decoder.py:31-51.

    `spans` is a list of tuples whose first two fields are (start, end) and
    whose LAST field is the score. Returns the accepted subset, sorted by
    start (stable), preserving reference tie behavior (Python stable sort
    over the input candidate order).
    """
    pred = has_overlapping if flat_ner else has_overlapping_nested
    conflict = lambda a, b: pred(a, b, multi_label=multi_label)  # noqa: E731
    accepted = []
    by_score = sorted(spans, key=lambda x: -x[-1])
    for cand in by_score:
        if not any(conflict(cand[:-1], a) for a in accepted):
            accepted.append(cand)
    return sorted(accepted, key=lambda x: x[0])


# ---------------------------------------------------------- vectorized form


def greedy_select(
    starts: np.ndarray,
    ends: np.ndarray,
    scores: np.ndarray,
    flat_ner: bool = True,
    multi_label: bool = False,
) -> np.ndarray:
    """Vectorized greedy non-overlap selection.

    Inputs are parallel arrays in candidate (start, width, class) row-major
    order. Returns indices of accepted candidates, ordered by (start asc,
    acceptance order) — identical output order to the reference's final
    stable sort by start.
    """
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-scores, kind="stable")
    acc_idx: list[int] = []
    acc_s = np.empty(n, dtype=np.int64)
    acc_e = np.empty(n, dtype=np.int64)
    m = 0
    for i in order:
        s, e = starts[i], ends[i]
        if m:
            as_, ae = acc_s[:m], acc_e[:m]
            equal = (as_ == s) & (ae == e)
            inter = (as_ <= e) & (s <= ae)
            if flat_ner:
                conflict = inter if not multi_label else (inter & ~equal)
            else:
                nested = ((as_ <= s) & (ae >= e)) | ((s <= as_) & (e >= ae))
                conflict = inter & ~nested
                if not multi_label:
                    conflict = conflict | equal
            if conflict.any():
                continue
        acc_s[m] = s
        acc_e[m] = e
        m += 1
        acc_idx.append(int(i))
    kept = np.asarray(acc_idx, dtype=np.int64)
    final = kept[np.argsort(starts[kept], kind="stable")]
    return final


def threshold_candidates(
    probs: np.ndarray, n_tokens: int, threshold: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """probs (L, K, C) → candidate arrays (starts, ends, class_idx, scores).

    Enumeration order is np.where row-major (s, k, c) — the reference's
    torch.where order (decoder.py:108). Spans with end > n_tokens dropped
    (decoder.py:110-112). `ends` are INCLUSIVE token indices (s + k), the
    reference's (s, s+k) convention (decoder.py:123).
    """
    s_idx, k_idx, c_idx = np.nonzero(probs > threshold)
    valid = (s_idx + k_idx + 1) <= n_tokens
    s_idx, k_idx, c_idx = s_idx[valid], k_idx[valid], c_idx[valid]
    scores = probs[s_idx, k_idx, c_idx]
    return s_idx, s_idx + k_idx, c_idx, scores


def decode_row(
    probs: np.ndarray,
    n_tokens: int,
    threshold: float,
    flat_ner: bool = True,
    multi_label: bool = False,
    n_labels: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full decode for one row: threshold → greedy → (starts, ends_incl,
    class_idx, scores) sorted by start. `n_labels` bounds the class axis for
    ragged-label batches (padded label slots)."""
    if n_labels is not None and n_labels < probs.shape[2]:
        probs = probs[:, :, :n_labels]
    s, e, c, sc = threshold_candidates(probs, n_tokens, threshold)
    keep = greedy_select(s, e, sc, flat_ner=flat_ner, multi_label=multi_label)
    return s[keep], e[keep], c[keep], sc[keep]


def _greedy_py(
    ss: list, es: list, cs: list, scs: list, flat_ner: bool, multi_label: bool
) -> list[tuple]:
    """Pure-Python greedy non-overlap over one row's candidates — faster
    than per-candidate numpy ops for the typical few-dozen-candidate case.
    Bit-identical semantics to greedy_select/greedy_search_reference:
    stable sort by score desc over (start, width, class) candidate order,
    accept iff no conflict, final stable sort by start."""
    n = len(ss)
    order = sorted(range(n), key=lambda i: -scs[i])
    acc: list[tuple] = []  # (start, end, idx)
    for i in order:
        s, e = ss[i], es[i]
        ok = True
        for as_, ae, _ in acc:
            if (as_, ae) == (s, e):
                if not multi_label:
                    ok = False
                    break
                continue
            if as_ > e or s > ae:
                continue
            if flat_ner:
                ok = False
                break
            # nested mode: overlap conflicts unless one nests the other
            if not ((as_ <= s and ae >= e) or (s <= as_ and e >= ae)):
                ok = False
                break
        if ok:
            acc.append((s, e, i))
    acc.sort(key=lambda t: t[0])
    return [(ss[i], es[i], cs[i], scs[i]) for _s, _e, i in acc]


def token_decode_reference(
    probs: np.ndarray,
    n_tokens: int,
    threshold: float,
    flat_ner: bool = False,
    multi_label: bool = False,
) -> list[tuple]:
    """Literal restatement of the reference TokenDecoder
    (gliner/decoding/decoder.py:130-170) for one row — the property-test
    oracle for decode_row_token.

    probs: (L, C, 3) sigmoid scores; roles [start, end, inside]. Candidate
    enumeration: above-threshold starts (row-major (pos, cls)) × above-
    threshold ends, ed ≥ st ∧ same class; the span is skipped if ANY
    inside score is strictly below the threshold (`(ins < threshold)
    .any()`, decoder.py:141-143); span score = min(inside ∪ {start_score,
    end_score}) (decoder.py:144-149, SURVEY §2.4 A4); then the same
    greedy_search as span mode.
    """
    p = probs[:n_tokens]
    p_start, p_end, p_ins = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    start_idx = np.where(p_start > threshold)
    end_idx = np.where(p_end > threshold)
    cands = []
    for st, cls_st in zip(*start_idx):
        for ed, cls_ed in zip(*end_idx):
            if ed >= st and cls_st == cls_ed:
                ins = p_ins[st : ed + 1, cls_st]
                if (ins < threshold).any():
                    continue
                combined_min = min(
                    float(ins.min()),
                    float(p_start[st, cls_st]),
                    float(p_end[ed, cls_st]),
                )
                cands.append((int(st), int(ed), int(cls_st), combined_min))
    return greedy_search_reference(
        cands, flat_ner=flat_ner, multi_label=multi_label
    )


def decode_row_token(
    probs: np.ndarray,
    n_tokens: int,
    threshold: float,
    flat_ner: bool = False,
    multi_label: bool = False,
) -> list[tuple]:
    """Vectorized token decode for one row (probs (L, C, 3)) →
    [(start, end_incl, class_idx, score), …] sorted by start.

    Per class: above-threshold start/end positions pair via the interval
    predicate; the all-inside-above-threshold constraint means valid spans
    lie within maximal runs of inside>thr, checked with a prefix-sum over
    the below-threshold indicator; min-inside via a sliding minimum is
    O(run) using prefix arg-min windows — here run lengths are ≤ L so a
    simple per-pair slice-min stays cheap and exactly matches the
    reference float semantics. Candidate order is (start-pos, class) major
    then (end-pos, class) — identical to the reference's nested
    torch.where loops, so greedy tie behavior is preserved.
    """
    p = probs[:n_tokens]
    p_start, p_end, p_ins = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    s_pos, s_cls = np.where(p_start > threshold)
    if len(s_pos) == 0:
        return []
    C = p.shape[1]
    # per-class above-threshold end positions (ascending — for a fixed
    # class, the reference's (pos, cls) row-major inner loop visits its
    # matching ends in position order, so this preserves candidate order)
    ends_by_cls = [
        np.where(p_end[:, ci] > threshold)[0] for ci in range(C)
    ]
    # next 'bad' inside position at-or-after i, per class: every end
    # strictly before it satisfies the all-inside-above-threshold rule.
    # STRICT <, matching the reference's `(ins < threshold).any()` skip
    # (decoder.py:141-143)
    bad = p_ins < threshold
    nb = np.where(bad, np.arange(n_tokens)[:, None], n_tokens)
    nb = np.minimum.accumulate(nb[::-1], axis=0)[::-1]  # (L, C)
    cands = []
    for st, cls_st in zip(s_pos.tolist(), s_cls.tolist()):
        ec = ends_by_cls[cls_st]
        lo = int(np.searchsorted(ec, st))
        hi = int(np.searchsorted(ec, nb[st, cls_st]))
        if lo == hi:
            continue
        st_score = float(p_start[st, cls_st])
        col = p_ins[:, cls_st]
        for ed in ec[lo:hi].tolist():
            score = min(
                float(col[st : ed + 1].min()),
                st_score,
                float(p_end[ed, cls_st]),
            )
            cands.append((st, ed, cls_st, score))
    if not cands:
        return []
    ss = [c[0] for c in cands]
    es = [c[1] for c in cands]
    cs = [c[2] for c in cands]
    scs = [c[3] for c in cands]
    return _greedy_py(ss, es, cs, scs, flat_ner, multi_label)


def decode_batch(
    probs: np.ndarray,
    n_tokens: np.ndarray,
    threshold: float,
    flat_ner: bool = True,
    multi_label: bool = False,
    n_labels: np.ndarray | None = None,
) -> list[list[tuple]]:
    """Batched decode: probs (B, L, K, C) → per-row lists of
    (start, end_incl, class_idx, score) tuples, sorted by start.

    One np.nonzero over the whole batch (row-major (b, s, k, c) order ⇒
    each row's slice is exactly the reference torch.where order,
    decoder.py:108) followed by a pure-Python greedy per row — amortizes
    the per-row numpy call overhead that dominated decode_row at batch
    scale. Semantically identical to [decode_row(probs[b], …) for b] —
    pinned by tests against the reference-literal implementation.
    """
    B = probs.shape[0]
    b_idx, s_idx, k_idx, c_idx = np.nonzero(probs > threshold)
    valid = (s_idx + k_idx + 1) <= n_tokens[b_idx]
    if n_labels is not None:
        valid &= c_idx < n_labels[b_idx]
    b_idx, s_idx, k_idx, c_idx = (
        b_idx[valid],
        s_idx[valid],
        k_idx[valid],
        c_idx[valid],
    )
    scores = probs[b_idx, s_idx, k_idx, c_idx]
    e_idx = s_idx + k_idx
    bounds = np.searchsorted(b_idx, np.arange(B + 1))
    ss_l = s_idx.tolist()
    es_l = e_idx.tolist()
    cs_l = c_idx.tolist()
    sc_l = scores.tolist()
    out: list[list[tuple]] = []
    for b in range(B):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if lo == hi:
            out.append([])
            continue
        out.append(
            _greedy_py(
                ss_l[lo:hi], es_l[lo:hi], cs_l[lo:hi], sc_l[lo:hi],
                flat_ner, multi_label,
            )
        )
    return out


def score_fixed_spans(
    probs: np.ndarray,
    spans: list[tuple],
    n_tokens: int,
    threshold: float = 0.4,
    flat_ner: bool = True,
    multi_label: bool = False,
) -> list[tuple]:
    """Confidence of spans DERIVED from fixed (gold) endpoints under
    token-level probs (L, C, 3) — the reference confidence-annotation
    path (create_confidence_splits.py:42-58 `calculate_span_score` gold
    branch + :16-36 `greedy_search`), used to annotate training data with
    model confidence for curation splits.

    Reference semantics exactly: the candidate set is the CROSS PRODUCT
    of all gold starts × all gold ends of the SAME class with ed >= st
    (`for st, cls_st in zip(*start_idx): for ed, cls_ed in
    zip(*end_idx)`, :44-45) — with ≥2 same-class gold spans this yields
    combined candidates beyond the gold spans themselves, which then
    compete in greedy. Score = min(inside[st..ed, c] ∪ {start[st, c],
    end[ed, c]}); a candidate with ANY inside prob < threshold is
    dropped. Enumeration order (outer: gold-list starts, inner:
    gold-list ends) is preserved so stable-sort score ties break like
    the reference.

    spans: [(tok_start, tok_end_incl, class_idx)], indices into the
    decoded token stream. Endpoints that fall outside the (possibly
    truncated) token stream are dropped per-pair (the reference assumes
    in-range gold; truncation can orphan spans here). Returns
    [(tok_start, tok_end_incl, class_idx, score)] sorted by start.

    This one function backs BOTH the Spark operator and the pure-Python
    oracle — span-set parity is by construction (CLAUDE.md invariant).
    """
    n_classes = probs.shape[1]
    starts = [(st, c) for st, _ed, c in spans]
    ends = [(ed, c) for _st, ed, c in spans]
    ss: list[int] = []
    es: list[int] = []
    cs: list[int] = []
    scs: list[float] = []
    for st, cst in starts:
        if st < 0 or st >= n_tokens or cst < 0 or cst >= n_classes:
            continue
        for ed, ced in ends:
            if ced != cst or ed < st or ed >= n_tokens:
                continue
            ins = probs[st : ed + 1, cst, 2]
            if (ins < threshold).any():
                continue
            sc = min(
                float(ins.min()),
                float(probs[st, cst, 0]),
                float(probs[ed, cst, 1]),
            )
            ss.append(int(st))
            es.append(int(ed))
            cs.append(int(cst))
            scs.append(sc)
    return _greedy_py(ss, es, cs, scs, flat_ner, multi_label)
