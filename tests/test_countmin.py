"""Count-min sketch (operators/sketches.py): overestimate guarantee,
merge associativity, streaming fold parity, crash-orphan invisibility."""
import collections

from pyspark.sql import functions as F

from gliner_spark.operators.sketches import (
    build_countmin,
    cms_lookup,
    current_countmin,
    fold_countmin_batch,
    merge_countmin,
)

WORDS = [f"w{i % 37}" for i in range(500)] + ["hot"] * 200


def _df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "word string")


def test_estimates_bounded_below_by_truth_and_close(spark):
    df = _df(spark, WORDS)
    sk = build_countmin(df, "word", depth=4, width=1024)
    keys = _df(spark, sorted(set(WORDS)))
    est = {
        r["word"]: r["est"]
        for r in cms_lookup(sk, keys, "word", depth=4, width=1024).collect()
    }
    true = collections.Counter(WORDS)
    n = len(WORDS)
    for w, t in true.items():
        assert est[w] >= t, w                    # never undercounts
        assert est[w] <= t + (2.72 / 1024) * n + 3, w
    # the hot key dominates and is found exactly (width >> keys)
    assert est["hot"] == 200


def test_absent_key_estimates_zero_or_collision(spark):
    sk = build_countmin(_df(spark, WORDS), "word", width=1024)
    est = cms_lookup(
        sk, _df(spark, ["never-seen-key"]), "word", width=1024
    ).collect()[0]["est"]
    assert est >= 0
    assert est <= 20  # only hash collisions can inflate it


def test_merge_equals_oneshot_build(spark):
    a, b = WORDS[:300], WORDS[300:]
    merged = merge_countmin(
        build_countmin(_df(spark, a), "word", width=256),
        build_countmin(_df(spark, b), "word", width=256),
    )
    oneshot = build_countmin(_df(spark, WORDS), "word", width=256)
    ma = {(r["d"], r["bucket"]): r["n"] for r in merged.collect()}
    mo = {(r["d"], r["bucket"]): r["n"] for r in oneshot.collect()}
    assert ma == mo


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 2), ("b", 1)], "word string, w long"
    )
    sk = build_countmin(df, "word", width=64, weight_col="w")
    est = {
        r["word"]: r["est"]
        for r in cms_lookup(
            sk, _df(spark, ["a", "b"]), "word", width=64
        ).collect()
    }
    assert est["a"] >= 7 and est["b"] >= 1


def test_streaming_fold_parity_and_crash_orphan(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("cms_state"))
    a, b = WORDS[:250], WORDS[250:]
    fold_countmin_batch(_df(spark, a), state, "word", width=256)
    fold_countmin_batch(_df(spark, b), state, "word", width=256)
    live = current_countmin(spark, state)
    oneshot = build_countmin(_df(spark, WORDS), "word", width=256)
    got = {(r["d"], r["bucket"]): r["n"] for r in live.collect()}
    want = {(r["d"], r["bucket"]): r["n"] for r in oneshot.collect()}
    assert got == want
    # exactly one live generation after the folds
    import os

    oks = [f for f in os.listdir(state) if f.endswith(".ok")]
    assert len(oks) == 1
    # crash orphan: a generation directory WITHOUT a marker is invisible
    gen = int(oks[0][len("_gen="):-len(".ok")])
    # gen+5 so the next fold's own commit (gen+1) can't absorb it
    orphan = os.path.join(state, f"_gen={gen + 5}")
    live.limit(1).write.mode("overwrite").parquet(orphan)  # no marker
    still = current_countmin(spark, state)
    assert {
        (r["d"], r["bucket"]): r["n"] for r in still.collect()
    } == want
    # the NEXT fold's GC sweeps the markerless orphan (ADVICE r4:
    # without the sweep a crash between marker-remove and rmtree leaks
    # the dir forever) while the new live generation stays intact
    fold_countmin_batch(_df(spark, a[:10]), state, "word", width=256)
    assert not os.path.exists(orphan)
    assert current_countmin(spark, state) is not None


def test_single_shuffle_build_plan(spark):
    df = _df(spark, WORDS)
    plan = (
        build_countmin(df, "word", width=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # only the (d, bucket) agg


def test_heavy_hitters_mg_guarantee(spark):
    from gliner_spark.operators.sketches import heavy_hitters_fold

    # stream: one dominant key + a long uniform tail, folded in 3 batches
    words = (
        ["hot"] * 120 + [f"t{i % 60}" for i in range(300)] + ["warm"] * 40
    )
    batches = [words[:150], words[150:300], words[300:]]
    state = None
    for b in batches:
        state = heavy_hitters_fold(state, _df(spark, b), "word", k=20)
    got = {r["key"]: r["n"] for r in state.collect()}
    true = collections.Counter(words)
    n = len(words)
    eps_n = n / 21
    assert len(got) <= 20
    # every key above eps*N must survive, and estimates never overcount
    for w, t in true.items():
        if t > eps_n:
            assert w in got, w
        if w in got:
            assert got[w] <= t
            assert got[w] >= t - eps_n
    assert "hot" in got and "warm" in got


def test_heavy_hitters_small_input_is_exact(spark):
    from gliner_spark.operators.sketches import heavy_hitters_fold

    words = ["a", "a", "b", "c"]
    state = heavy_hitters_fold(None, _df(spark, words), "word", k=10)
    got = {r["key"]: r["n"] for r in state.collect()}
    assert got == {"a": 2, "b": 1, "c": 1}  # fewer keys than k: no cut


# ---------------------------------------------------------------- KMV


def _ids(spark, lo, hi, dup=1):
    rows = [(f"id{i}",) for i in range(lo, hi)] * dup
    return spark.createDataFrame(rows, "key string")


def test_kmv_exact_while_unsaturated(spark):
    from gliner_spark.operators.sketches import build_kmv, kmv_estimate

    sk = build_kmv(_ids(spark, 0, 40, dup=3), "key", k=256)
    vs = [r["v"] for r in sk.collect()]
    assert len(vs) == 40  # duplicates collapse; sketch holds the set
    assert kmv_estimate(vs, 256) == 40.0


def test_kmv_estimate_accuracy_when_saturated(spark):
    from gliner_spark.operators.sketches import build_kmv, kmv_estimate

    n = 20000
    sk = build_kmv(_ids(spark, 0, n), "key", k=512)
    vs = [r["v"] for r in sk.collect()]
    assert len(vs) == 512
    est = kmv_estimate(vs, 512)
    # stderr ~ n/sqrt(k-2) ≈ 4.4%; allow 4 sigma
    assert abs(est - n) / n < 0.18


def test_kmv_merge_equals_oneshot_and_idempotent(spark):
    from gliner_spark.operators.sketches import build_kmv, merge_kmv

    a = build_kmv(_ids(spark, 0, 3000), "key", k=128)
    b = build_kmv(_ids(spark, 2000, 6000), "key", k=128)
    one = build_kmv(_ids(spark, 0, 6000), "key", k=128)
    merged = merge_kmv(a, b, k=128)
    assert sorted(r["v"] for r in merged.collect()) == sorted(
        r["v"] for r in one.collect()
    )
    again = merge_kmv(merged, b, k=128)
    assert sorted(r["v"] for r in again.collect()) == sorted(
        r["v"] for r in merged.collect()
    )


def test_kmv_set_ops_exact_when_union_fits(spark):
    from gliner_spark.operators.sketches import build_kmv, kmv_set_ops

    a = build_kmv(_ids(spark, 0, 60), "key", k=256)
    b = build_kmv(_ids(spark, 40, 100), "key", k=256)
    r = kmv_set_ops(a, b, k=256)
    assert r["union_est"] == 100.0
    assert r["intersect_est"] == 20.0
    assert abs(r["jaccard"] - 0.2) < 1e-12


def test_kmv_set_ops_planted_overlap_saturated(spark):
    from gliner_spark.operators.sketches import build_kmv, kmv_set_ops

    # |A|=|B|=8000, overlap 4000 -> union 12000, jaccard 1/3
    a = build_kmv(_ids(spark, 0, 8000), "key", k=512)
    b = build_kmv(_ids(spark, 4000, 12000), "key", k=512)
    r = kmv_set_ops(a, b, k=512)
    assert r["sampled"] == 512
    assert abs(r["union_est"] - 12000) / 12000 < 0.18
    assert abs(r["jaccard"] - 1 / 3) < 0.09  # binomial 4sigma ≈ 0.083
    assert abs(r["intersect_est"] - 4000) / 4000 < 0.3


def test_kmv_empty_and_disjoint(spark):
    from gliner_spark.operators.sketches import build_kmv, kmv_set_ops

    e = build_kmv(_ids(spark, 0, 0), "key", k=64)
    r0 = kmv_set_ops(e, e, k=64)
    assert r0["union_est"] == 0.0 and r0["sampled"] == 0
    a = build_kmv(_ids(spark, 0, 30), "key", k=64)
    b = build_kmv(_ids(spark, 1000, 1030), "key", k=64)
    rd = kmv_set_ops(a, b, k=64)
    assert rd["union_est"] == 60.0 and rd["intersect_est"] == 0.0


def test_kmv_streaming_fold_matches_batch(spark, tmp_path):
    from gliner_spark.operators.sketches import (
        build_kmv,
        current_kmv,
        fold_kmv_batch,
    )

    state = str(tmp_path / "kmv_state")
    fold_kmv_batch(_ids(spark, 0, 2000), state, "key", k=128)
    fold_kmv_batch(_ids(spark, 1500, 4000), state, "key", k=128)
    # replay of the second batch must be a value-level no-op
    fold_kmv_batch(_ids(spark, 1500, 4000), state, "key", k=128)
    live = sorted(r["v"] for r in current_kmv(spark, state).collect())
    one = sorted(
        r["v"] for r in build_kmv(_ids(spark, 0, 4000), "key", k=128).collect()
    )
    assert live == one
    # generation GC removes superseded parquet dirs, not just markers
    import os

    dirs = [
        d
        for d in os.listdir(state)
        if d.startswith("_gen=") and not d.endswith(".ok")
    ]
    assert len(dirs) == 1


def test_kmv_fold_crash_orphan_invisible(spark, tmp_path):
    import os

    from gliner_spark.operators.sketches import current_kmv, fold_kmv_batch

    state = str(tmp_path / "kmv_crash")
    fold_kmv_batch(_ids(spark, 0, 100), state, "key", k=64)
    before = sorted(r["v"] for r in current_kmv(spark, state).collect())
    # simulate a crash between parquet write and marker creation
    os.makedirs(os.path.join(state, "_gen=99"), exist_ok=True)
    after = sorted(r["v"] for r in current_kmv(spark, state).collect())
    assert before == after


# ---------------------------------------------------------------- AMS


def test_ams_f2_accuracy_uniform_and_skewed(spark):
    from gliner_spark.operators.sketches import ams_f2, build_ams

    uni = _ids(spark, 0, 1000)  # f=1 each -> F2 = 1000
    sk = build_ams(uni, "key", d=256)
    est = ams_f2(sk)
    assert abs(est - 1000) / 1000 < 0.35  # var 2F2^2/d

    hot = spark.createDataFrame(
        [("hot",)] * 200 + [(f"k{i}",) for i in range(100)],
        "key string",
    )
    # F2 = 200^2 + 100 = 40100
    est2 = ams_f2(build_ams(hot, "key", d=256))
    assert abs(est2 - 40100) / 40100 < 0.35


def test_ams_join_size_estimate(spark):
    from gliner_spark.operators.sketches import ams_join_size, build_ams

    # A: keys 0..199 twice each; B: keys 100..399 three times each
    a = _ids(spark, 0, 200, dup=2)
    b = _ids(spark, 100, 400, dup=3)
    sa = build_ams(a, "key", d=512, seed=5)
    sb = build_ams(b, "key", d=512, seed=5)
    # true join size = 100 shared keys * 2 * 3 = 600
    est = ams_join_size(sa, sb)
    assert abs(est - 600) < 0.5 * 600 + 200  # high-variance estimator


def test_ams_merge_linearity_and_weighted_delete(spark):
    from gliner_spark.operators.sketches import (
        ams_f2,
        build_ams,
        merge_ams,
    )

    a = _ids(spark, 0, 50)
    b = _ids(spark, 50, 120)
    one = build_ams(_ids(spark, 0, 120), "key", d=64, seed=9)
    merged = merge_ams(
        build_ams(a, "key", d=64, seed=9),
        build_ams(b, "key", d=64, seed=9),
    )
    za = one.first()
    zb = merged.first()
    for c in one.columns:
        assert abs(za[c] - zb[c]) < 1e-9

    # delete = negative weight: folding -1 copies of b cancels it
    neg = b.withColumn("w", F.lit(-1.0))
    cancelled = merge_ams(
        merged, build_ams(neg, "key", d=64, seed=9, weight_col="w")
    )
    only_a = build_ams(a, "key", d=64, seed=9)
    zc = cancelled.first()
    zd = only_a.first()
    for c in only_a.columns:
        assert abs(zc[c] - zd[c]) < 1e-9
    assert abs(ams_f2(cancelled) - ams_f2(only_a)) < 1e-9


def test_ams_mismatched_depth_raises(spark):
    from gliner_spark.operators.sketches import ams_join_size, build_ams

    a = build_ams(_ids(spark, 0, 10), "key", d=8)
    b = build_ams(_ids(spark, 0, 10), "key", d=16)
    import pytest as _pt

    with _pt.raises(ValueError):
        ams_join_size(a, b)


# ---------------------------------------------------------------- HLL


def test_hll_estimate_and_merge_accuracy(spark):
    from gliner_spark.operators.sketches import (
        build_hll,
        hll_estimate,
        merge_hll,
    )

    a = build_hll(_ids(spark, 0, 30000), "key", lg_k=12)
    est = hll_estimate(a).first()["est"]
    assert abs(est - 30000) / 30000 < 0.05

    b = build_hll(_ids(spark, 20000, 50000), "key", lg_k=12)
    m = hll_estimate(merge_hll(a.unionByName(b))).first()["est"]
    assert abs(m - 50000) / 50000 < 0.05


def test_hll_grouped_parquet_roundtrip_fold(spark, tmp_path):
    from gliner_spark.operators.sketches import (
        current_hll,
        fold_hll_batch,
        hll_estimate,
    )

    def shard(lo, hi):
        rows = [(f"g{i % 2}", f"id{i}") for i in range(lo, hi)]
        return spark.createDataFrame(rows, "grp string, key string")

    state = str(tmp_path / "hll_state")
    fold_hll_batch(shard(0, 4000), state, "key", ("grp",))
    fold_hll_batch(shard(3000, 8000), state, "key", ("grp",))
    # replay: register-max union is a value-level no-op
    fold_hll_batch(shard(3000, 8000), state, "key", ("grp",))
    live = hll_estimate(current_hll(spark, state))
    got = {r["grp"]: r["est"] for r in live.collect()}
    assert set(got) == {"g0", "g1"}
    for g, est in got.items():
        assert abs(est - 4000) / 4000 < 0.06
