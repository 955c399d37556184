"""Word tokenizer with char offsets.

Byte-identical to the reference WhitespaceTokenSplitter
(gliner/data_processing/tokenizer.py:15-21): regex
``\\w+(?:[-_]\\w+)*|\\S`` over ``re.finditer``, yielding
(token, char_start, char_end).

The same regex is used on the Spark side:
 - natively via ``F.regexp_extract_all`` when only token strings are
   needed (offsets-free paths: shingling, token counting), and
 - inside mapInArrow (this function, applied per Arrow batch) when char
   offsets must be carried for entity char-span projection
   (reference gliner/model.py:429-447).
"""

from __future__ import annotations

import re

TOKEN_PATTERN = r"\w+(?:[-_]\w+)*|\S"
TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_with_offsets(text: str) -> tuple[list[str], list[int], list[int]]:
    """Return (tokens, char_starts, char_ends) for one text."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in TOKEN_RE.finditer(text):
        tokens.append(m.group())
        starts.append(m.start())
        ends.append(m.end())
    return tokens, starts, ends


def char_span_to_word_span(
    text: str, char_start: int, char_end: int
) -> tuple[int, int] | None:
    """Char-offset span → (word_start, word_end_incl) token indices — the
    reference's eval-data prep mapping (gliner/evaluation/evaluate.py:30-61
    `process`: cumulative char counting to locate word boundaries of char
    spans), restated over this tokenizer's exact offsets.

    Returns the smallest token range covering [char_start, char_end), or
    None when no token overlaps the span.
    """
    _toks, starts, ends = tokenize_with_offsets(text)
    ws = we = None
    for i, (s, e) in enumerate(zip(starts, ends)):
        if e > char_start and s < char_end:
            if ws is None:
                ws = i
            we = i
    if ws is None:
        return None
    return ws, we


def prep_tokens(
    text: str, max_len: int
) -> tuple[list[str], list[int], list[int]]:
    """Tokenize + empty-text guard + truncation, mirroring the reference's
    SpanProcessor.preprocess_example (processor.py:345-352): empty token
    list → ["[PAD]"], then truncate to max_len."""
    tokens, starts, ends = tokenize_with_offsets(text)
    if not tokens:
        return ["[PAD]"], [0], [0]
    if len(tokens) > max_len:
        return tokens[:max_len], starts[:max_len], ends[:max_len]
    return tokens, starts, ends
