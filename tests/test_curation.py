"""Quality-aware canonical selection (operators/curation.py): the
keep-the-best-copy policy, deterministic ties, and singleton
exclusion — over exact fingerprint groups (best_of_group) and over
near-dup components (best_of_component). Oracle parity rides the
all-queries gate.
"""

from __future__ import annotations

from football_data_pipeline_spark.operators.curation import (
    best_of_component,
    best_of_group,
)

SCHEMA = "doc_id long, text string, lang string, source string"
PAIRS = "doc_a long, doc_b long"


def test_best_quality_wins_not_min_id(spark):
    """Two docs with the IDENTICAL word set (one fingerprint group)
    but different mean token scores — repeating an existing word
    changes the classifier mean without changing the distinct set.
    The canonical must be the higher-scoring member regardless of
    id order, exactly one member flagged canonical, and singletons
    produce no row."""
    rows = [
        (10, "alpha beta gamma", "en", "s"),
        (11, "gamma gamma gamma alpha beta", "en", "s"),
        (20, "omega", "en", "s"),  # singleton: excluded
    ]
    out = {
        r.doc_id: r
        for r in best_of_group(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert set(out) == {10, 11}
    assert out[10].score != out[11].score  # the repeat moved the mean
    best = max(out.values(), key=lambda r: (r.score, -r.doc_id))
    assert all(r.canonical_doc_id == best.doc_id for r in out.values())
    assert out[best.doc_id].is_canonical
    assert sum(r.is_canonical for r in out.values()) == 1


def test_tie_breaks_to_min_id_and_group_size(spark):
    """Identical texts up to word order → equal scores; the tie goes
    to the smallest doc_id and n_docs counts the whole group."""
    rows = [
        (3, "kiwi plum", "en", "s"),
        (1, "plum kiwi", "en", "s"),
        (2, "kiwi plum", "en", "s"),
    ]
    out = {
        r.doc_id: r
        for r in best_of_group(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert all(r.canonical_doc_id == 1 and r.n_docs == 3 for r in out.values())
    assert out[1].is_canonical and not out[2].is_canonical


def test_component_canonical_spans_exact_groups(spark):
    """A near-dup component folds in ALL members of its exact
    fingerprint groups, and the canonical is the best-scoring member
    across the WHOLE component — even a non-rep member of a non-min
    group. Docs 1/2 share one word set (rep 1), doc 5 another
    (rep 5); the rep-level near-dup pair (1, 5) makes one component
    with members {1, 2, 5}; doc 2's repeated high-scoring word can
    make IT the canonical though it is nobody's rep."""
    rows = [
        (1, "alpha beta gamma", "en", "s"),
        (2, "gamma gamma gamma alpha beta", "en", "s"),  # same set as 1
        (5, "alpha beta gamma delta", "en", "s"),
        (9, "unrelated words here", "en", "s"),  # no component: no row
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    pairs = spark.createDataFrame([(1, 5)], PAIRS)
    out = {r.doc_id: r for r in best_of_component(docs, pairs).collect()}
    assert set(out) == {1, 2, 5}
    assert all(r.component == 1 and r.n_docs == 3 for r in out.values())
    best = max(out.values(), key=lambda r: (r.score, -r.doc_id))
    assert all(r.canonical_doc_id == best.doc_id for r in out.values())
    assert sum(r.is_canonical for r in out.values()) == 1


def test_component_tie_breaks_to_min_id_and_transitivity(spark):
    """Equal scores (same words, different order) tie to the min
    doc_id, and components are TRANSITIVE: pairs (1,5), (5,7) form
    one component labeled by its minimum."""
    rows = [
        (7, "kiwi plum fig", "en", "s"),
        (5, "plum kiwi fig", "en", "s"),
        (1, "fig kiwi plum", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    pairs = spark.createDataFrame([(1, 5), (5, 7)], PAIRS)
    out = {r.doc_id: r for r in best_of_component(docs, pairs).collect()}
    assert set(out) == {1, 5, 7}
    assert all(
        r.component == 1 and r.canonical_doc_id == 1 and r.n_docs == 3
        for r in out.values()
    )
    assert out[1].is_canonical and not out[5].is_canonical


def test_component_empty_pairs_yields_no_rows(spark):
    docs = spark.createDataFrame([(1, "a b c", "en", "s")], SCHEMA)
    pairs = spark.createDataFrame([], PAIRS)
    assert best_of_component(docs, pairs).count() == 0
