"""In-batch negative type sampling (operators/generation.py —
SURVEY U3, the reference's processor.get_negatives /
batch_generate_class_mappings data semantics made deterministic)."""
import hashlib

from gliner_spark.operators.generation import (
    attach_negative_types,
    sample_negative_types,
)

ROWS = [
    (1, 10, ["person", "city"]),
    (1, 11, ["city", "drug"]),
    (1, 12, ["animal"]),
    (2, 20, ["person"]),
    (2, 21, ["ship"]),
]
SCHEMA = "batch_id long, ex_id long, types array<string>"


def _md5_order(vals, salt):
    return sorted(
        vals, key=lambda v: hashlib.md5(f"{salt}|{v}".encode()).hexdigest()
    )


def test_sample_negatives_union_shuffle_truncate(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        r["batch_id"]: r["negatives"]
        for r in sample_negative_types(df, n_neg=3, seed=7).collect()
    }
    want1 = _md5_order({"person", "city", "drug", "animal"}, "7")[:3]
    want2 = _md5_order({"person", "ship"}, "7")[:2]
    assert out[1] == want1
    assert out[2] == want2
    # deterministic across runs
    again = {
        r["batch_id"]: r["negatives"]
        for r in sample_negative_types(df, n_neg=3, seed=7).collect()
    }
    assert out == again
    # different seed -> (almost surely) different order
    other = {
        r["batch_id"]: r["negatives"]
        for r in sample_negative_types(df, n_neg=3, seed=8).collect()
    }
    assert set(other[1]) <= {"person", "city", "drug", "animal"}


def test_attach_negatives_label_sets(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        r["ex_id"]: r.asDict()
        for r in attach_negative_types(
            df, n_neg=4, max_types=3, neg_ratio=1, seed=7
        ).collect()
    }
    negs1 = _md5_order({"person", "city", "drug", "animal"}, "7")[:4]
    for ex_id, (bid, _, types) in ((r[1], r) for r in ROWS):
        got = out[ex_id]["label_set"]
        # gold types always present unless truncated away by max_types
        merged = list(dict.fromkeys(types + negs1[: len(types)]))
        if bid == 2:
            negs2 = _md5_order({"person", "ship"}, "7")[:4]
            merged = list(dict.fromkeys(types + negs2[: len(types)]))
        want = _md5_order(set(merged), "7x")[:3]
        assert got == want, ex_id
        assert len(got) <= 3


def test_attach_negatives_zero_ratio_is_gold_only(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        r["ex_id"]: r["label_set"]
        for r in attach_negative_types(
            df, neg_ratio=0, max_types=25, seed=7
        ).collect()
    }
    for _, ex_id, types in ROWS:
        assert sorted(out[ex_id]) == sorted(set(types))
