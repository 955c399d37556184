"""Word tokenizers with char offsets, behind a splitter registry.

Default splitter is byte-identical to the reference
WhitespaceTokenSplitter (gliner/data_processing/tokenizer.py:15-21):
regex ``\\w+(?:[-_]\\w+)*|\\S`` over ``re.finditer``, yielding
(token, char_start, char_end).

The registry mirrors the reference dispatcher shape
(gliner/data_processing/tokenizer.py:269-296 WordsSplitter): named
splitters, same (token, start, end) iterator contract, library-backed
entries raising ModuleNotFoundError when the library is absent. In this
container none of jieba/mecab/janome/hanlp/camel/indicnlp/spacy/stanza
exist, so the in-environment equivalents are:

  whitespace  the reference default regex (fixture parity — DEFAULT);
  cjk         han/kana/hangul runs split per CHARACTER, everything else
              by the whitespace regex — the standard dictionary-free CJK
              fallback (``\\w+`` alone clumps an entire han run into one
              token, making zh/ja NER structurally wrong);
  universal   per-text dispatch: CJK codepoints present → cjk, else
              whitespace — the MultiLangWordsSplitter detect→route shape
              (tokenizer.py:148-188) without the langdetect dependency.

The whitespace regex is also used on the Spark side:
 - natively via ``F.regexp_extract_all`` when only token strings are
   needed (offsets-free paths: shingling, token counting), and
 - inside mapInArrow (applied per Arrow batch) when char offsets must be
   carried for entity char-span projection (gliner/model.py:429-447).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

TOKEN_PATTERN = r"\w+(?:[-_]\w+)*|\S"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# han (incl. ext A), hiragana/katakana, hangul — split one token per char
_CJK_CLASS = r"[㐀-䶿一-鿿぀-ヿ가-힯]"
CJK_TOKEN_PATTERN = rf"{_CJK_CLASS}|\w+(?:[-_]\w+)*|\S"
CJK_TOKEN_RE = re.compile(CJK_TOKEN_PATTERN)  # ordered alternation: CJK first
_HAS_CJK_RE = re.compile(_CJK_CLASS)

Splitter = Callable[[str], Iterator[tuple[str, int, int]]]


def _regex_splitter(rx: re.Pattern) -> Splitter:
    def split(text: str) -> Iterator[tuple[str, int, int]]:
        for m in rx.finditer(text):
            yield m.group(), m.start(), m.end()

    return split


def _universal_splitter(text: str) -> Iterator[tuple[str, int, int]]:
    rx = CJK_TOKEN_RE if _HAS_CJK_RE.search(text) else TOKEN_RE
    for m in rx.finditer(text):
        yield m.group(), m.start(), m.end()


def _library_gated(name: str, module: str) -> Callable[[], Splitter]:
    def factory() -> Splitter:
        # message leads with the reference's exact convention
        # ("Please install X with: `pip install X`" —
        # gliner/data_processing/tokenizer.py:27,42,59,75) so call sites
        # matching on it port unchanged; the trailing sentence is this
        # engine's added guidance
        raise ModuleNotFoundError(
            f"Please install {module} with: `pip install {module}` "
            f"(splitter '{name}'); in this environment use 'whitespace', "
            f"'cjk' or 'universal', or register_splitter() a custom one"
        )

    return factory


# name → zero-arg factory returning a Splitter (mirrors WordsSplitter's
# splitter_type strings; library-backed ones fail exactly like the
# reference does when the library is missing)
SPLITTERS: dict[str, Callable[[], Splitter]] = {
    "whitespace": lambda: _regex_splitter(TOKEN_RE),
    "cjk": lambda: _regex_splitter(CJK_TOKEN_RE),
    "universal": lambda: _universal_splitter,
    "spacy": _library_gated("spacy", "spacy"),
    "jieba": _library_gated("jieba", "jieba"),
    "hanlp": _library_gated("hanlp", "hanlp"),
    "mecab": _library_gated("mecab", "python-mecab-ko"),
    "janome": _library_gated("janome", "janome"),
    "camel": _library_gated("camel", "camel-tools"),
    "hindi": _library_gated("hindi", "indic-nlp-library"),
    "stanza": _library_gated("stanza", "stanza"),
}


_RESOLVED: dict[str, Splitter] = {}  # hot path: resolve once per name


def register_splitter(name: str, factory: Callable[[], Splitter]) -> None:
    """Extension hook: plug a custom splitter into the registry."""
    SPLITTERS[name] = factory
    _RESOLVED.pop(name, None)


def get_splitter(name: str = "whitespace") -> Splitter:
    got = _RESOLVED.get(name)
    if got is not None:
        return got
    try:
        factory = SPLITTERS[name]
    except KeyError:
        raise ValueError(
            f"unknown splitter {name!r}; choose one of {sorted(SPLITTERS)}"
        ) from None
    got = _RESOLVED[name] = factory()
    return got


def tokenize_with_offsets(
    text: str, splitter: str = "whitespace"
) -> tuple[list[str], list[int], list[int]]:
    """Return (tokens, char_starts, char_ends) for one text."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for tok, s, e in get_splitter(splitter)(text):
        tokens.append(tok)
        starts.append(s)
        ends.append(e)
    return tokens, starts, ends


def char_span_to_word_span(
    text: str, char_start: int, char_end: int, splitter: str = "whitespace"
) -> tuple[int, int] | None:
    """Char-offset span → (word_start, word_end_incl) token indices — the
    reference's eval-data prep mapping (gliner/evaluation/evaluate.py:30-61
    `process`: cumulative char counting to locate word boundaries of char
    spans), restated over this tokenizer's exact offsets.

    Returns the smallest token range covering [char_start, char_end), or
    None when no token overlaps the span.
    """
    _toks, starts, ends = tokenize_with_offsets(text, splitter)
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
    text: str, max_len: int, splitter: str = "whitespace"
) -> tuple[list[str], list[int], list[int]]:
    """Tokenize + empty-text guard + truncation, mirroring the reference's
    SpanProcessor.preprocess_example (processor.py:345-352): empty token
    list → ["[PAD]"], then truncate to max_len."""
    tokens, starts, ends = tokenize_with_offsets(text, splitter)
    if not tokens:
        return ["[PAD]"], [0], [0]
    if len(tokens) > max_len:
        return tokens[:max_len], starts[:max_len], ends[:max_len]
    return tokens, starts, ends
