"""Drop-in API façade (gliner_spark/api.py) vs the reference call shapes
(gliner/model.py predict_entities/batch_predict_entities/run;
gliner/multitask/*.py pipeline classes). List inputs run the kernel
oracle; DataFrame inputs run the distributed operators — both share the
kernel, so the two paths must agree exactly."""

from gliner_spark.api import (
    GLiNERClassifier,
    GLiNEROpenExtractor,
    GLiNERQuestionAnswerer,
    GLiNERRelationExtractor,
    GLiNERSpark,
    GLiNERSummarizer,
)

TEXTS = [
    "alice manages the ingest service at acme analytics.",
    "bob reviewed the spark upgrade for the platform team.",
    "the billing job failed after the schema migration.",
]
LABELS = ["person", "organization", "service"]


def test_from_pretrained_and_predict_entities_shapes():
    model = GLiNERSpark.from_pretrained("any/model-id-is-ignored")
    ents = model.predict_entities(TEXTS[0], LABELS, threshold=0.3)
    assert isinstance(ents, list)
    for e in ents:
        assert set(e) == {"start", "end", "text", "label", "score"}
        assert e["text"] == TEXTS[0][e["start"]:e["end"]]
        assert e["label"] in LABELS
        assert e["score"] > 0.3


def test_batch_predict_forwards_to_run():
    model = GLiNERSpark()
    a = model.batch_predict_entities(TEXTS, LABELS, threshold=0.3)
    b = model.run(TEXTS, LABELS, threshold=0.3)
    assert a == b
    assert len(a) == len(TEXTS)
    assert model.predict_entities(TEXTS[0], LABELS, threshold=0.3) == a[0]


def test_dataframe_path_matches_list_path(spark):
    model = GLiNERSpark()
    rows = [(f"c{i}", 0, "user", t, None, None) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    got = {
        (r.conv_id, r.start, r.end, r.label)
        for r in model.predict_entities_df(df, LABELS, threshold=0.3).collect()
    }
    expected = {
        (f"c{i}", e["start"], e["end"], e["label"])
        for i, ents in enumerate(model.run(TEXTS, LABELS, threshold=0.3))
        for e in ents
    }
    assert got == expected and len(expected) > 0


def test_relation_extractor_shape():
    rex = GLiNERRelationExtractor()
    out = rex(TEXTS, relations=["works for", "uses"], entity_types=LABELS,
              ner_threshold=0.3, rel_threshold=0.3)
    assert len(out) == len(TEXTS)
    for triples in out:
        for t in triples:
            assert set(t) == {
                "source", "relation", "target", "score", "start", "end",
            }
            assert t["relation"] in {"works for", "uses"}
    # single-string input is wrapped like the reference base pipeline
    single = rex(TEXTS[0], relations=["uses"], entity_types=LABELS,
                 ner_threshold=0.3, rel_threshold=0.3)
    assert len(single) == 1


def test_multitask_pipeline_classes():
    cls = GLiNERClassifier()
    got = cls(TEXTS, classes=["infrastructure", "billing", "people"])
    assert len(got) == len(TEXTS)
    assert all(set(g) == {"label", "score"} for g in got)

    qa = GLiNERQuestionAnswerer()
    answers = qa(TEXTS[0], "who manages the service?", threshold=0.2)
    assert isinstance(answers, list)

    summ = GLiNERSummarizer()
    s = summ(TEXTS, threshold=0.2)
    assert len(s) == len(TEXTS) and all(isinstance(x, str) for x in s)

    ox = GLiNEROpenExtractor()
    spans = ox(TEXTS[0], labels=["match"], threshold=0.2)
    assert len(spans) == 1


def test_predict_with_embeds_matches_run():
    model = GLiNERSpark()
    handle = model.encode_labels(LABELS + LABELS)  # dedup like model.py:202
    assert handle[0] == LABELS
    a = model.predict_with_embeds(TEXTS, handle, threshold=0.3)
    b = model.run(TEXTS, LABELS, threshold=0.3)
    assert a == b
