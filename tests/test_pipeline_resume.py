"""End-to-end pipeline + checkpoint-resume semantics (north rule:
"resumable from checkpoint with per-partition lineage + metrics")."""

import pytest

from gliner_spark.pipeline import run_pipeline
from gliner_spark.sources.transcripts import synth_transcripts

ENTITY_TYPES = ["person", "organization", "tool"]
RELATIONS = ["uses", "works for"]


@pytest.fixture(scope="module")
def tiny_transcripts(spark):
    df = synth_transcripts(spark, n_convs=12).cache()
    df.count()
    return df


def _run(spark, df, out_dir, relations=RELATIONS):
    return run_pipeline(
        spark, df, out_dir, ENTITY_TYPES, relations, input_token="t12"
    )


def test_pipeline_end_to_end(spark, tiny_transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    res = _run(spark, tiny_transcripts, out)
    assert res.entities.count() > 0
    assert res.triples.count() > 0
    assert res.nodes.count() > 0
    assert res.edges.count() > 0
    # every edge endpoint exists in nodes
    missing = (
        res.edges.join(
            res.nodes.select("entity_id"),
            res.edges.subj_id == res.nodes.entity_id,
            "left_anti",
        ).count()
    )
    assert missing == 0
    # lineage recorded one complete row per stage
    lin = res.runner.lineage().collect()
    assert {r.stage for r in lin} == {
        "entities", "triples_re", "triples_cooccur", "canon_map",
        "triples_canonical", "nodes", "edges",
    }
    assert all(r.status == "complete" for r in lin)
    # per-partition metrics exist and sum to stage row counts
    m = res.runner.metrics()
    ent_rows = sum(
        r.n_rows for r in m.where("stage = 'entities'").collect()
    )
    assert ent_rows == res.entities.count()


def test_resume_skips_completed_stages(spark, tiny_transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe_resume"))
    first = _run(spark, tiny_transcripts, out)
    triples1 = sorted(map(tuple, first.triples.collect()))
    n_lineage1 = first.runner.lineage().count()

    second = _run(spark, tiny_transcripts, out)
    triples2 = sorted(map(tuple, second.triples.collect()))
    # identical output, no stage re-ran (no new lineage rows)
    assert triples1 == triples2
    assert second.runner.lineage().count() == n_lineage1


def test_mid_run_crash_resume(spark, tiny_transcripts, tmp_path_factory,
                              monkeypatch):
    """North-rule resume: kill the pipeline mid-run (crash injected at the
    canonicalization stage), rerun, and require (a) the stages completed
    before the crash are NOT recomputed and (b) the final triples equal a
    never-crashed run's."""
    import gliner_spark.pipeline as pipeline_mod

    out = str(tmp_path_factory.mktemp("pipe_crash"))
    real_canon = pipeline_mod.canonicalize
    calls = {"n": 0}

    def exploding_canonicalize(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected mid-run failure")

    monkeypatch.setattr(pipeline_mod, "canonicalize", exploding_canonicalize)
    with pytest.raises(RuntimeError, match="injected"):
        _run(spark, tiny_transcripts, out)
    assert calls["n"] == 1
    runner_peek = __import__(
        "gliner_spark.plans.lineage", fromlist=["StageRunner"]
    ).StageRunner(spark, out)
    done_before = {r.stage for r in runner_peek.lineage().collect()}
    assert {"entities", "triples_re"} <= done_before
    assert "canon_map" not in done_before

    # recover: restore the real stage, rerun — earlier stages resume
    monkeypatch.setattr(pipeline_mod, "canonicalize", real_canon)
    res = _run(spark, tiny_transcripts, out)
    lineage = res.runner.lineage().collect()
    assert [r.stage for r in lineage].count("entities") == 1
    assert [r.stage for r in lineage].count("triples_re") == 1
    assert [r.stage for r in lineage].count("canon_map") == 1

    clean = str(tmp_path_factory.mktemp("pipe_clean"))
    ref = _run(spark, tiny_transcripts, clean)
    assert sorted(map(tuple, res.canonical_triples.collect())) == sorted(
        map(tuple, ref.canonical_triples.collect())
    )


def test_config_change_invalidates_only_downstream(
    spark, tiny_transcripts, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("pipe_inval"))
    first = _run(spark, tiny_transcripts, out)
    base_stages = first.runner.lineage().count()

    # changing the relation list must rerun triples_re + triples_canonical
    # + nodes + edges (nodes cover triple endpoints), but NOT entities /
    # canon_map / cooccur
    second = _run(spark, tiny_transcripts, out, relations=["uses"])
    lin = second.runner.lineage().collect()
    assert len(lin) == base_stages + 4
    rerun = [r.stage for r in lin]
    assert rerun.count("triples_re") == 2
    assert rerun.count("triples_canonical") == 2
    assert rerun.count("nodes") == 2
    assert rerun.count("edges") == 2
    assert rerun.count("entities") == 1
    assert rerun.count("canon_map") == 1


def test_resume_never_returns_stale_other_fingerprint_output(
    spark, tmp_path_factory
):
    """Lineage rows are append-only but stage paths are overwritten per
    run: after run(A) → run(B) → run(A), the old complete (stage, fpA)
    row must NOT resume from the path (which now holds B's output) — the
    on-disk fingerprint marker forces a recompute."""
    from gliner_spark.plans.lineage import StageRunner, fingerprint

    out = str(tmp_path_factory.mktemp("stale"))
    runner = StageRunner(spark, out)
    fp_a, fp_b = fingerprint("s", "A"), fingerprint("s", "B")

    def produce_a():
        return spark.range(3).selectExpr("id", "'A' as tag")

    def produce_b():
        return spark.range(5).selectExpr("id", "'B' as tag")

    assert runner.run_stage("s", fp_a, produce_a).count() == 3
    assert runner.run_stage("s", fp_b, produce_b).count() == 5
    again = runner.run_stage("s", fp_a, produce_a)
    assert again.count() == 3
    assert {r.tag for r in again.collect()} == {"A"}


def test_mixed_language_pipeline_universal_tokenizer(
    spark, tiny_transcripts, tmp_path_factory
):
    """E2E auto-dispatch (VERDICT r02 #8): with tokenizer='universal'
    (pipeline_job's default) zh turns get per-character spans end-to-end
    while latin turns keep whitespace tokenization — matched exactly
    against the pure-Python oracle under the same config."""
    from pyspark.sql import functions as F

    from gliner_spark.config import PipelineConfig
    from gliner_spark.kernel.oracle import OraclePipeline

    zh_texts = [
        "张伟在清华大学工作。",
        "李娜访问了北京和上海。",
        "ACME 公司聘用了王芳。",
    ]
    zh = spark.createDataFrame(
        [(f"zh{i}", 0, "user", t, None, None) for i, t in enumerate(zh_texts)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    mixed = tiny_transcripts.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).unionByName(zh)
    cfg = PipelineConfig(tokenizer="universal", threshold=0.3)
    out = str(tmp_path_factory.mktemp("pipe_zh"))
    res = run_pipeline(
        spark, mixed, out, ENTITY_TYPES, RELATIONS, cfg=cfg,
        input_token="mixed-zh",
    )
    got_zh = {
        (r.conv_id, r.start, r.end, r.label, r.text)
        for r in res.entities.where(
            F.col("conv_id").startswith("zh")
        ).collect()
    }
    oracle = OraclePipeline(cfg)
    expected = oracle.run(zh_texts, ENTITY_TYPES, threshold=0.3)
    want = {
        (f"zh{i}", e["start"], e["end"], e["label"], e["text"])
        for i, ents in enumerate(expected)
        for e in ents
    }
    assert want, "oracle emitted no zh entities at threshold 0.3"
    assert got_zh == want
    # per-character dispatch really happened: no span swallows a clause
    assert all(e - s <= 12 for _c, s, e, _l, _t in want)
    # latin conversations still extract (whitespace path of the dispatch)
    assert res.entities.where(~F.col("conv_id").startswith("zh")).count() > 0
