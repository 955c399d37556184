"""Labels trie for constrained label generation.

API contract of the reference trie
(gliner/decoding/trie/python_labels_trie.py:34-143, the Python fallback
for `labels_trie.pyx`), restated clean-room over nested dicts:

 * the trie stores LABEL TOKEN-ID SEQUENCES; `get(prefix)` returns the
   legal next token ids after a prefix, in insertion order, or [] when
   the prefix is absent/complete;
 * constructor entries are PERMANENT (survive removal); entries added
   later via add/add_batch are transient;
 * removal prunes a transient leaf chain bottom-up and stops at the
   first node that is permanent or still has other children — shared
   prefixes with surviving entries are never damaged.

`prefix_allowed_tokens` mirrors the generation-time hook
(gliner/modeling/decoder.py:212-219): when the trie allows nothing
(label complete or prefix invalid), the only legal token is EOS. The
greedy constrained generator below is the in-environment stand-in for
`model.generate(prefix_allowed_tokens_fn=…)` — this engine has no
generative decoder (declared in SURVEY §2 as the decoder-variant scope
cut), but the constraint machinery itself is real, tested, and would
drive any scorer that yields per-step token scores.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

_PERM = 0  # node slots
_KIDS = 1


def _node(permanent: bool) -> list:
    return [permanent, {}]


class LabelsTrie:
    def __init__(self, entities: Sequence[Sequence[int]] | None = None):
        self._root = _node(True)
        if entities:
            for ent in entities:
                self._insert(ent, permanent=True)

    # ------------------------------------------------------------ mutation
    def _insert(self, tokens: Sequence[int], permanent: bool) -> None:
        cur = self._root
        for tid in tokens:
            nxt = cur[_KIDS].get(tid)
            if nxt is None:
                nxt = cur[_KIDS][tid] = _node(permanent)
            cur = nxt

    def add(self, tokens: Sequence[int]) -> None:
        self._insert(tokens, permanent=False)

    def add_batch(self, entities: Sequence[Sequence[int]]) -> None:
        for ent in entities:
            self._insert(ent, permanent=False)

    def remove_entity(self, tokens: Sequence[int]) -> None:
        # walk down recording the path; missing prefix → no-op
        path = [(None, self._root)]
        cur = self._root
        for tid in tokens:
            nxt = cur[_KIDS].get(tid)
            if nxt is None:
                return
            path.append((tid, nxt))
            cur = nxt
        # prune bottom-up: stop at a permanent node or one with children
        for i in range(len(path) - 1, 0, -1):
            tid, node = path[i]
            if node[_KIDS] or node[_PERM]:
                break
            path[i - 1][1][_KIDS].pop(tid, None)

    def remove_batch(self, entities: Sequence[Sequence[int]]) -> None:
        for ent in entities:
            self.remove_entity(ent)

    # ------------------------------------------------------------- queries
    def get(self, prefix: Sequence[int]) -> list[int]:
        """Legal next token ids after `prefix` (insertion order); [] when
        the prefix is absent or names a completed label."""
        cur = self._root
        for tid in prefix:
            cur = cur[_KIDS].get(tid)
            if cur is None:
                return []
        return list(cur[_KIDS])


def prefix_allowed_tokens(
    trie: LabelsTrie, eos_token_id: int
) -> Callable[[Sequence[int]], list[int]]:
    """The reference's generation hook (decoder.py:212-219): trie-allowed
    next tokens, or [EOS] when the trie allows nothing."""

    def allowed(current_seq: Sequence[int]) -> list[int]:
        nxt = trie.get(list(current_seq))
        return nxt if nxt else [eos_token_id]

    return allowed


def constrained_greedy_generate(
    step_scores: Callable[[Sequence[int]], dict[int, float]],
    trie: LabelsTrie,
    eos_token_id: int,
    max_new_tokens: int = 32,
) -> list[int]:
    """Greedy decode under the trie constraint: at each step, pick the
    highest-scoring token among the ALLOWED set (ties → first in trie
    insertion order, matching stable-greedy semantics everywhere else in
    this engine); stop at EOS or the token budget. `step_scores` maps the
    generated-so-far sequence to {token_id: score} — any scorer shape,
    including a transformer head, fits this contract."""
    out: list[int] = []
    allowed_fn = prefix_allowed_tokens(trie, eos_token_id)
    for _ in range(max_new_tokens):
        allowed = allowed_fn(out)
        if allowed == [eos_token_id]:
            break
        scores = step_scores(out)
        best = None
        best_score = None
        for tid in allowed:  # insertion order = deterministic tie-break
            sc = scores.get(tid, float("-inf"))
            if best_score is None or sc > best_score:
                best, best_score = tid, sc
        out.append(best)
    return out
