"""Corpus-trained BPE tokenizer — the tokenizer-CONSTRUCTION stage of a
pretraining data pipeline (Sennrich et al. 2015 subword merges; GPT-2's
pretoken-scoped variant shape: merges never cross pretoken boundaries).

The reference consumes a pre-trained tokenizer
(gliner/data_processing/tokenizer.py wraps fixed splitters); building
the vocabulary FROM the corpus is part of the training-data surface the
Spark engine adds, alongside the bigram-LM quality filter (lm.py) and
the learned quality classifier (classifier.py).

Scale shape (the whole point — nothing here grows with corpus size
except one combining aggregate):
* pre-tokenize + word count: one narrow JVM-side map
  (regexp_extract_all + explode) into ONE map-side-combining aggregate
  on the pretoken key — the only shuffle.
* head-dict cap: top `max_words` by (count desc, word) is a
  TakeOrderedAndProject, so the driver collect is bounded and
  corpus-size-independent. Zipf's law makes the dropped tail's pair
  mass negligible, and classic BPE already trains on a word-frequency
  dict rather than the raw corpus, so this is the standard trainer
  shape, not a new approximation.
* merge training: driver-side incremental pair-count loop over the
  ≤max_words dict (a pair→words inverted index means each merge only
  touches the words that contain it). Zero Spark jobs.
* encoding: a pure map (mapInPandas); the merge list rides the task
  closure (n_merges entries — tiny), unique pretokens are memoized per
  worker batch. Zero shuffle, scales as a narrow stage.

Training and encoding share `_apply_merges`: a word in the training
dict encodes to EXACTLY its final training-time symbol sequence
(pinned in tests), because encoding replays the merges in training
order — the same left-to-right, non-overlapping application the
trainer used.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import BPE_ISH_PATTERN

__all__ = ["BPEModel", "train_bpe", "bpe_encode"]

_PRETOKEN_RE = re.compile(BPE_ISH_PATTERN)


class BPEModel:
    """Trained merge list, in merge order. `vocab()` is the implied
    token vocabulary: every single character seen in the training dict
    plus one entry per merge."""

    def __init__(self, merges: list[tuple[str, str]], base_chars: list[str]):
        self.merges = list(merges)
        self.base_chars = list(base_chars)

    def vocab(self) -> list[str]:
        return self.base_chars + [a + b for a, b in self.merges]


def _apply_merges(
    word: str, merges: list[tuple[str, str]], cache: dict[str, list[str]]
) -> list[str]:
    """Replay the merge list in training order over one pretoken:
    each merge replaces its occurrences left-to-right, non-overlapping —
    identical to the trainer's update rule, so training-dict words
    reproduce their training-time segmentation exactly."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        j = 0
        n = len(syms)
        while j < n:
            if j + 1 < n and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    cache[word] = syms
    return syms


def _train_merges(
    word_freqs: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Incremental BPE trainer over a word-frequency dict. Each round
    picks the highest-count adjacent symbol pair (ties broken by the
    lexicographically smallest pair — fully deterministic) and merges it
    in every word that contains it, updating only those words' pair
    contributions."""
    syms = [list(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, s in enumerate(syms):
        f = freqs[i]
        for p in zip(s, s[1:]):
            pair_counts[p] += f
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best, cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for i in list(pair_words[best]):
            s = syms[i]
            f = freqs[i]
            for p in zip(s, s[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            out: list[str] = []
            j = 0
            n = len(s)
            while j < n:
                if j + 1 < n and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                pair_words[p].add(i)
        pair_words.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    max_words: int = 65536,
    min_pair_count: int = 2,
) -> BPEModel:
    """Train a BPE merge list from the corpus: one combining word-count
    aggregate, a bounded TakeOrderedAndProject head collect, then the
    driver-side merge loop (corpus-size-independent)."""
    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_ISH_PATTERN), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    head = counts.orderBy(F.desc("f"), F.asc("w")).limit(max_words).collect()
    word_freqs = [(r["w"], int(r["f"])) for r in head]
    merges = _train_merges(word_freqs, n_merges, min_pair_count)
    base_chars = sorted({c for w, _ in word_freqs for c in w})
    return BPEModel(merges, base_chars)


def bpe_encode(
    docs: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
) -> DataFrame:
    """Encode every document with the trained merges:
    (doc_id, n_pretokens, n_tokens[, tokens]). Pure narrow map —
    the merge list rides the closure; unique pretokens memoized per
    batch. Pretokenization uses the same ASCII-only regex on both the
    JVM (training counts) and Python (encoding) sides; agreement is
    pinned in tests."""
    merges = model.merges
    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_pretokens", T.IntegerType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
    ]
    if with_tokens:
        fields.append(
            T.StructField("tokens", T.ArrayType(T.StringType()), False)
        )
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_pretokens": [],
                "n_tokens": [],
            }
            if with_tokens:
                out["tokens"] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pres = _PRETOKEN_RE.findall(text or "")
                toks: list[str] = []
                for w in pres:
                    toks.extend(_apply_merges(w, merges, cache))
                out["doc_id"].append(int(doc_id))
                out["n_pretokens"].append(len(pres))
                out["n_tokens"].append(len(toks))
                if with_tokens:
                    out["tokens"].append(toks)
            yield pd.DataFrame(out)

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(run, schema)
