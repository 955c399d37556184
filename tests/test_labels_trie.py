"""Labels trie (reference python_labels_trie.py contract) + constrained
greedy generation (decoder.py:212-219 hook semantics)."""

from gliner_spark.kernel.labels_trie import (
    LabelsTrie,
    constrained_greedy_generate,
    prefix_allowed_tokens,
)

# label vocabulary as token-id sequences: person=[1,2], person name=[1,2,7],
# place=[1,3], org=[4]
LABELS = [[1, 2], [1, 2, 7], [1, 3], [4]]


def test_get_next_tokens_and_order():
    t = LabelsTrie(LABELS)
    assert t.get([]) == [1, 4]          # insertion order preserved
    assert t.get([1]) == [2, 3]
    assert t.get([1, 2]) == [7]         # longer label continues
    assert t.get([1, 2, 7]) == []       # complete
    assert t.get([9]) == []             # absent prefix
    assert t.get([4]) == []


def test_transient_removal_preserves_shared_and_permanent():
    t = LabelsTrie(LABELS)
    t.add([1, 5])
    t.add_batch([[6, 6], [6, 8]])
    assert t.get([1]) == [2, 3, 5]
    assert t.get([6]) == [6, 8]
    t.remove_entity([1, 5])
    # transient branch gone, shared permanent prefix intact
    assert t.get([1]) == [2, 3]
    t.remove_entity([6, 6])
    assert t.get([6]) == [8]            # sibling transient survives
    # removing a PERMANENT entry is a no-op on the structure
    t.remove_entity([1, 2, 7])
    assert t.get([1, 2]) == [7]
    # removing an absent entry is a no-op
    t.remove_entity([9, 9, 9])
    assert t.get([]) == [1, 4, 6]


def test_prefix_allowed_tokens_falls_back_to_eos():
    t = LabelsTrie(LABELS)
    allowed = prefix_allowed_tokens(t, eos_token_id=0)
    assert allowed([]) == [1, 4]
    assert allowed([1, 2, 7]) == [0]    # complete label → EOS only
    assert allowed([9]) == [0]          # invalid prefix → EOS only


def test_constrained_generation_stays_in_trie():
    t = LabelsTrie(LABELS)

    # adversarial scorer: loves token 9 (never legal), then prefers the
    # longest path 1 → 2 → 7
    def scores(seq):
        return {9: 100.0, 1: 3.0, 2: 2.5, 7: 2.0, 3: 1.0, 4: 0.5}

    out = constrained_greedy_generate(scores, t, eos_token_id=0)
    assert out == [1, 2, 7]             # a valid complete label, never 9

    # scorer preferring the short branch stops there
    def scores2(seq):
        return {4: 10.0, 1: 1.0}

    assert constrained_greedy_generate(scores2, t, eos_token_id=0) == [4]

    # tie scores → first in insertion order (deterministic)
    def tie(seq):
        return {}

    assert constrained_greedy_generate(tie, t, eos_token_id=0)[0] == 1

    # token budget respected
    t2 = LabelsTrie([[1] * 50])
    assert len(constrained_greedy_generate(
        lambda s: {1: 1.0}, t2, eos_token_id=0, max_new_tokens=5)) == 5


def test_generate_labels_operator(spark):
    """Distributed trie-constrained generation: deterministic, every
    generated label is a root-to-leaf trie path (the reference get()
    returns [] only at leaves, so prefixes with children are walked
    through — 'organization' with child 'unit' always extends)."""
    from gliner_spark.operators.generation import generate_labels
    from gliner_spark.sources.transcripts import synth_transcripts

    vocab = [
        "person", "person name", "organization", "organization unit",
        "location", "tool",
    ]
    leaf_labels = {"person name", "organization unit", "location", "tool"}
    t = synth_transcripts(spark, 10).cache()
    t.count()
    rows = generate_labels(t, vocab).collect()
    assert len(rows) == t.count()
    assert all(r.label in leaf_labels for r in rows)
    assert all(r.n_steps == len(r.label.split()) for r in rows)
    # deterministic
    again = sorted((r.conv_id, r.turn_idx, r.label)
                   for r in generate_labels(t, vocab).collect())
    assert sorted((r.conv_id, r.turn_idx, r.label) for r in rows) == again
    assert len({r.label for r in rows}) > 1  # scorer actually routes
    t.unpersist()
