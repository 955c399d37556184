"""Edge cases end-to-end: empty/whitespace/long texts, empty label sets,
unicode, and the max_len truncation boundary."""

import pytest
from pyspark.sql import Row

from gliner_spark.config import PipelineConfig
from gliner_spark.kernel.oracle import OraclePipeline
from gliner_spark.kernel.tokenizer import prep_tokens
from gliner_spark.operators.ner import extract_entities
from gliner_spark.operators.relations import extract_triples

LABELS = ["person", "tool"]


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(conv_id="c0", turn_idx=i, text=t) for i, t in enumerate(texts)]
    )


def test_empty_and_whitespace_texts(spark):
    texts = ["", "   ", "\n\t ", "ok", "Alice uses Redis"]
    df = _df(spark, texts)
    oracle = OraclePipeline()
    expected = oracle.run(texts, LABELS)
    got = extract_entities(df, LABELS).collect()
    by_turn = {}
    for r in got:
        by_turn.setdefault(r.turn_idx, []).append(r)
    for i, exp in enumerate(expected):
        assert len(by_turn.get(i, [])) == len(exp)
    # [PAD] guard: no entity may be emitted for empty rows
    assert 0 not in by_turn and 1 not in by_turn and 2 not in by_turn


def test_empty_relation_output_on_entityless_rows(spark):
    df = _df(spark, ["", "the of and to"])
    oracle = OraclePipeline()
    n_oracle = sum(
        len(t) for t in oracle.extract_relations(
            ["", "the of and to"], ["uses"], LABELS)
    )
    assert extract_triples(df, ["uses"], LABELS).count() == n_oracle


def test_truncation_boundary(spark):
    """A text beyond max_len tokens must truncate identically to the
    reference rule (processor.py:349-352) in pipeline and oracle."""
    cfg = PipelineConfig(max_len=16)
    long_text = " ".join(f"w{i}" for i in range(40)) + " Alice"
    toks, starts, ends = prep_tokens(long_text, cfg.max_len)
    assert len(toks) == 16 and toks[0] == "w0" and toks[-1] == "w15"
    df = _df(spark, [long_text])
    oracle = OraclePipeline(cfg)
    exp = oracle.run([long_text], LABELS)[0]
    got = extract_entities(df, LABELS, cfg).collect()
    assert {(r.start, r.end, r.label) for r in got} == {
        (e["start"], e["end"], e["label"]) for e in exp
    }
    # nothing may reference a token beyond the truncation point
    limit_char = ends[-1]
    assert all(r.end <= limit_char for r in got)


def test_unicode_text_parity(spark):
    """Non-ASCII text flows through the Python-re tokenizer identically in
    Spark and oracle (the kernel is Unicode-aware by design; only the
    native corpus-analytics path is ASCII-scoped)."""
    texts = ["汉字 Alice café naïve — Zürich", "données Müller 東京"]
    df = _df(spark, texts)
    oracle = OraclePipeline()
    expected = set()
    for i, ents in enumerate(oracle.run(texts, LABELS)):
        for e in ents:
            expected.add((i, e["start"], e["end"], e["label"], e["text"]))
    got = {
        (r.turn_idx, r.start, r.end, r.label, r.text)
        for r in extract_entities(df, LABELS).collect()
    }
    assert got == expected


def test_single_and_duplicate_labels(spark):
    """Duplicate labels dedupe order-preserving (reference model.py:202)."""
    df = _df(spark, ["Alice uses Redis daily"])
    a = extract_entities(df, ["person", "person", "tool"]).collect()
    b = extract_entities(df, ["person", "tool"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_new_ops_degenerate_inputs(spark):
    """r4 operators on degenerate inputs: PQ training on an empty
    corpus raises cleanly; DSIR with an EMPTY target still returns
    finite weights (all-zero target counts just shift every log-ratio);
    SemDeDup on fewer rows than clusters still works (kmeans filler
    re-seats empty cells); knn_pq with an empty query set returns 0
    rows with the right schema."""
    import pytest as _pytest

    from gliner_spark.operators.curation import dsir_weights
    from gliner_spark.operators.dedup import semantic_duplicates
    from gliner_spark.operators.similarity import knn_pq, train_pq

    empty = spark.createDataFrame([], "vec_id: bigint, embedding: array<double>")
    with _pytest.raises(Exception):
        train_pq(empty, m=2, nbits=2)

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta delta")],
        ["doc_id", "text"],
    )
    w = {r.doc_id: r.log_weight
         for r in dsir_weights(docs, docs.where("doc_id < 0"),
                               n_buckets=64).collect()}
    assert set(w) == {0, 1}
    assert all(abs(v) < 1e6 and v == v for v in w.values())  # finite

    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    # more clusters than rows: runs cleanly (kmeans filler re-seats
    # empty cells); every point can become its own cluster, so the
    # within-cluster pair set is allowed to be empty
    over = semantic_duplicates(tiny, threshold=0.9, n_clusters=8).collect()
    assert {(r.vec_a, r.vec_b) for r in over} <= {(0, 1)}
    # one cluster = exact: the near-identical pair must be found
    one = semantic_duplicates(tiny, threshold=0.9, n_clusters=1).collect()
    assert {(r.vec_a, r.vec_b) for r in one} == {(0, 1)}

    books = train_pq(tiny, m=2, nbits=1, kmeans_iter=1)
    eq = spark.createDataFrame([], "query_id: bigint, embedding: array<double>")
    out = knn_pq(tiny, eq, books, k=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "score", "rank"]
