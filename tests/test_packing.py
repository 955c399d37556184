"""Sequence-packing operators (operators/packing.py): chunk_pack window
math and bin_pack greedy fill vs independent pure-python replays, plus
invariants (partition coverage, capacity, determinism)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.packing import bin_pack, chunk_pack, packing_stats

L = 16
SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    """Deterministic docs with a known token-count spread: doc i has
    (i * 7) % 41 tokens (some zero, some > L so the oversize path is
    exercised), text is that many 'w' words."""
    rows = []
    for i in range(120):
        n = (i * 7) % 41
        rows.append((i, " ".join(f"w{j}" for j in range(n))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _counts(n_docs=120):
    return {i: (i * 7) % 41 for i in range(n_docs) if (i * 7) % 41 > 0}


def test_chunk_pack_matches_python_replay(spark, docs):
    out = chunk_pack(docs, max_len=L, n_shards=SHARDS).collect()
    got = {
        (r.doc_id, r.chunk_idx): (r.tok_start, r.tok_end, r.pos_in_chunk)
        for r in out
    }
    counts = _counts()
    expected = {}
    stream_pos = {s: 0 for s in range(SHARDS)}
    for i in sorted(counts):
        s, n = i % SHARDS, counts[i]
        start = stream_pos[s]
        for ci in range(start // L, (start + n - 1) // L + 1):
            expected[(i, ci)] = (
                max(ci * L - start, 0),
                min((ci + 1) * L - start, n),
                max(start - ci * L, 0),
            )
        stream_pos[s] = start + n
    assert got == expected


def test_chunk_pack_covers_every_token_exactly_once(spark, docs):
    out = chunk_pack(docs, max_len=L, n_shards=SHARDS).collect()
    counts = _counts()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.tok_start, r.tok_end))
    assert set(per_doc) == set(counts)
    for did, spans in per_doc.items():
        spans.sort()
        # half-open slices tile [0, n_tokens) with no gap or overlap
        assert spans[0][0] == 0
        assert spans[-1][1] == counts[did]
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0
    # every chunk except the last per shard is exactly full
    fill = {}
    for r in out:
        fill[(r.shard, r.chunk_idx)] = (
            fill.get((r.shard, r.chunk_idx), 0) + (r.tok_end - r.tok_start)
        )
    for shard in set(s for s, _ in fill):
        idxs = sorted(ci for s, ci in fill if s == shard)
        for ci in idxs[:-1]:
            assert fill[(shard, ci)] == L
        assert 0 < fill[(shard, idxs[-1])] <= L


def test_bin_pack_matches_python_replay(spark, docs):
    out = bin_pack(docs, max_len=L, n_shards=SHARDS).collect()
    got = {
        r.doc_id: (r.shard, r.bin_idx, r.pos_in_bin, r.oversize) for r in out
    }
    counts = _counts()
    expected = {}
    for s in range(SHARDS):
        members = sorted(
            (i for i in counts if i % SHARDS == s),
            key=lambda i: (-counts[i], i),
        )
        bin_idx, fill = -1, L
        for i in members:
            n = counts[i]
            if fill + n > L:
                bin_idx, fill = bin_idx + 1, 0
            expected[i] = (s, bin_idx, fill, n > L)
            fill += n
    assert got == expected


def test_bin_pack_capacity_and_coverage(spark, docs):
    out = bin_pack(docs, max_len=L, n_shards=SHARDS).collect()
    counts = _counts()
    assert {r.doc_id for r in out} == set(counts)
    assert all(r.n_tokens == counts[r.doc_id] for r in out)
    bins = {}
    for r in out:
        bins.setdefault((r.shard, r.bin_idx), []).append(r)
    for members in bins.values():
        total = sum(r.n_tokens for r in members)
        if any(r.oversize for r in members):
            # an oversize doc owns its bin
            assert len(members) == 1
        else:
            assert total <= L
        # offsets are a valid contiguous layout
        members.sort(key=lambda r: r.pos_in_bin)
        pos = 0
        for r in members:
            assert r.pos_in_bin == pos
            pos += r.n_tokens


def test_packing_stats_consistent(spark, docs):
    packed = bin_pack(docs, max_len=L, n_shards=SHARDS)
    stats = {r.shard: r for r in packing_stats(packed, max_len=L).collect()}
    rows = packed.collect()
    for s in {r.shard for r in rows}:
        mine = [r for r in rows if r.shard == s]
        n_bins = max(r.bin_idx for r in mine) + 1
        st = stats[s]
        assert st.n_bins == n_bins
        assert st.n_docs == len(mine)
        assert st.total_tokens == sum(r.n_tokens for r in mine)
        packed_toks = sum(min(r.n_tokens, L) for r in mine)
        assert st.fill_ratio == round(packed_toks / (n_bins * L), 6)
        assert 0 < st.fill_ratio <= 1.0


def test_packing_deterministic_and_token_col_override(spark, docs):
    a = sorted(map(tuple, chunk_pack(docs, L, SHARDS).collect()))
    b = sorted(map(tuple, chunk_pack(docs, L, SHARDS).collect()))
    assert a == b
    # precomputed token counts short-circuit the tokenizer
    pre = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok"), "text"
    ).where(F.length("text") > 0)
    c = chunk_pack(pre, L, SHARDS, n_tokens_col="n_tok")
    assert sorted(map(tuple, c.collect())) == a


def test_chunk_pack_single_shuffle_plan(spark, docs):
    """Scale shape pinned: exactly one Exchange (the shard hash
    partitioning for the window); no extra shuffle for the explode."""
    plan = chunk_pack(docs, L, SHARDS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------- shuffle export


def _shuffle_oracle(ids, n_shards, seed):
    """Pure-python restatement of shuffle_export's integer md5 math."""
    import hashlib

    keyed = [
        (int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16), i)
        for i in ids
    ]
    out = {}
    by_shard = {}
    for k, i in sorted(keyed):
        s = (k * n_shards) >> 32
        by_shard.setdefault(s, []).append((k, i))
    for s, members in by_shard.items():
        for seq, (k, i) in enumerate(sorted(members), start=1):
            out[i] = (s, seq, k)
    return out


def test_shuffle_export_vs_python_oracle(spark, docs):
    from gliner_spark.operators.packing import shuffle_export

    got = {
        r.doc_id: (r.shard, r.seq, r.shuffle_key)
        for r in shuffle_export(docs, n_shards=SHARDS, seed=3).collect()
    }
    assert got == _shuffle_oracle(range(120), SHARDS, 3)


def test_shuffle_export_balance_and_reshuffle(spark, docs):
    from gliner_spark.operators.packing import shuffle_export

    out = shuffle_export(docs, n_shards=SHARDS, seed=0)
    sizes = {r.shard: r.n for r in out.groupBy("shard").count()
             .withColumnRenamed("count", "n").collect()}
    assert set(sizes) == set(range(SHARDS))       # every shard populated
    assert max(sizes.values()) < 2 * (120 / SHARDS)  # no gross skew
    # seq is a dense 1..n_s rank within each shard
    per = out.groupBy("shard").agg(
        F.min("seq").alias("lo"), F.max("seq").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert all(r.lo == 1 and r.hi == r.n for r in per)
    # a different seed is a genuinely different permutation
    other = shuffle_export(docs, n_shards=SHARDS, seed=1)
    joined = out.alias("a").join(other.alias("b"), "doc_id").where(
        (F.col("a.shard") == F.col("b.shard"))
        & (F.col("a.seq") == F.col("b.seq"))
    )
    assert joined.count() < 120


def test_shuffle_export_single_exchange_plan(spark, docs):
    from gliner_spark.operators.packing import shuffle_export

    plan = (
        shuffle_export(docs, n_shards=SHARDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------- rag chunking


def test_chunk_documents_vs_python(spark, docs):
    from gliner_spark.operators.packing import chunk_documents

    C, O = 7, 2
    S = C - O

    def oracle(n):
        if n == 0:
            return []
        k = max(1, -(-(n - O) // S))
        return [(i, i * S, min(i * S + C, n)) for i in range(k)]

    got = {}
    for r in chunk_documents(docs, chunk_tokens=C, overlap=O).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.tok_start, r.tok_end)
        )
    for i, n in [(i, (i * 7) % 41) for i in range(120)]:
        assert sorted(got.get(i, [])) == oracle(n), (i, n)


def test_chunk_documents_coverage_and_text(spark, docs):
    """Every token of every doc is covered; consecutive chunks overlap by
    exactly `overlap` except a possibly-shorter tail; chunk_text is the
    token slice."""
    from gliner_spark.operators.packing import chunk_documents

    out = chunk_documents(docs, chunk_tokens=10, overlap=3)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.tok_start, r.tok_end, r.chunk_text)
         for r in out.collect())
    )
    by_doc = {}
    for d, i, s, e, t in rows:
        by_doc.setdefault(d, []).append((i, s, e, t))
    for d, chunks in by_doc.items():
        n = (d * 7) % 41
        assert chunks[0][1] == 0 and chunks[-1][2] == n  # full coverage
        for (i1, s1, e1, _), (i2, s2, e2, _) in zip(chunks, chunks[1:]):
            assert i2 == i1 + 1 and s2 == e1 - 3  # stride = chunk - overlap
        for _, s, e, t in chunks:
            assert t == " ".join(f"w{j}" for j in range(s, e))


def test_chunk_documents_rejects_bad_overlap(spark, docs):
    import pytest as _pytest

    from gliner_spark.operators.packing import chunk_documents

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)
