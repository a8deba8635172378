"""Quality-aware canonical selection (operators/curation.py): the
keep-the-best-copy policy, deterministic ties, and singleton
exclusion. Oracle parity rides the all-queries gate.
"""

from __future__ import annotations

from football_data_pipeline_spark.operators.curation import best_of_group

SCHEMA = "doc_id long, text string, lang string, source string"


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
