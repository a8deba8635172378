"""Exact-substring dedup: planted-overlap semantics (VERDICT r4
item 4) — maximal-span reconstruction, the min-length threshold, and
the short-document filter.
"""

from __future__ import annotations

import pytest

from football_data_pipeline_spark.operators.substring import (
    substring_dedup_report,
    substring_dup_spans,
)

import pytest as _pytest_r14

# r14 slow tier: multi-minute e2e file — excluded from the default
# (driver-window) run by pytest.ini; the full suite (-m "") runs it.
pytestmark = _pytest_r14.mark.slow

K = 5  # small k so the planted texts stay readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _w(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_overlap_maximal_span(spark):
    """A 12-word run planted verbatim in two otherwise-disjoint docs
    comes back as ONE maximal span of exactly 12 words in each."""
    shared = _w("s", 12)
    docs = _docs(
        spark,
        [
            (1, _w("a", 7) + " " + shared + " " + _w("b", 6)),
            (2, _w("c", 3) + " " + shared + " " + _w("d", 9)),
            (3, _w("e", 30)),  # no overlap
        ],
    )
    spans = {r.doc_id: r for r in substring_dup_spans(docs, K).collect()}
    assert set(spans) == {1, 2}
    assert spans[1].span_start == 7 and spans[1].span_len == 12
    assert spans[2].span_start == 3 and spans[2].span_len == 12


def test_sub_threshold_run_not_flagged(spark):
    """A shared run of k-1 words produces no k-gram match."""
    shared = _w("s", K - 1)
    docs = _docs(
        spark,
        [
            (1, _w("a", 10) + " " + shared),
            (2, shared + " " + _w("b", 10)),
        ],
    )
    assert substring_dup_spans(docs, K).count() == 0


def test_adjacent_runs_merge_and_distinct_spans_stay_separate(spark):
    """Two shared runs merge into one span when they touch
    (gap ≤ 0) and stay separate spans when split by > k fresh words."""
    r1, r2 = _w("x", 7), _w("y", 7)
    docs = _docs(
        spark,
        [
            # doc 1: r1 then a 10-word gap then r2 → two spans
            (1, r1 + " " + _w("g", 10) + " " + r2),
            # docs 2/3 donate r1 and r2 separately
            (2, r1 + " " + _w("p", 8)),
            (3, _w("q", 8) + " " + r2),
            # doc 4: r1 immediately followed by r2 → matches doc 1's
            # runs at both ends; its own two spans merge? no — the
            # concatenation "x6 y0..." k-grams exist only in doc 4,
            # so the two spans touch but each is exactly 7 words
            (4, r1 + " " + r2),
        ],
    )
    spans = substring_dup_spans(docs, K).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    assert sorted(by_doc[1]) == [(0, 7), (17, 7)]
    # doc 4's spans [0,7) and [7,14) touch (7 ≤ 2 + 5) → one merged
    # 14-word duplicated region
    assert sorted(by_doc[4]) == [(0, 14)]


def test_short_docs_filtered_both_sides(spark):
    """Identical docs shorter than k never reach the gram index —
    their truncated window must not fabricate a match."""
    docs = _docs(spark, [(1, "tiny shared text"), (2, "tiny shared text")])
    assert substring_dup_spans(docs, K).count() == 0


def test_report_accounting(spark):
    shared = _w("s", 10)
    docs = _docs(
        spark,
        [
            (1, shared + " " + _w("a", 10)),
            (2, shared),
        ],
    )
    rep = {r.doc_id: r for r in substring_dedup_report(docs, K).collect()}
    assert rep[1].n_words == 20 and rep[1].dup_words == 10
    assert rep[1].dup_fraction == pytest.approx(0.5)
    assert rep[2].n_words == 10 and rep[2].dup_fraction == pytest.approx(1.0)
    assert rep[1].max_span_len == 10 and rep[1].n_dup_spans == 1


def test_strip_keeps_owner_cuts_copy(spark):
    """The min-doc_id owner keeps the repeated run; every other doc
    loses exactly that run; clean and sub-k docs pass through
    verbatim."""
    from football_data_pipeline_spark.operators.substring import strip_dup_spans

    shared = _w("s", 10)
    d1 = _w("a", 6) + " " + shared  # owner (min id holding the run)
    d2 = shared + " " + _w("b", 6)  # loses the run
    d3 = _w("c", 12)  # clean, passes through
    d4 = "tiny doc"  # sub-k, passes through
    docs = _docs(spark, [(1, d1), (2, d2), (3, d3), (4, d4)])
    out = {r.doc_id: r.text for r in strip_dup_spans(docs, K).collect()}
    assert out[1] == d1
    assert out[2] == _w("b", 6)
    assert out[3] == d3
    assert out[4] == d4
    assert len(out) == 4  # every input doc present exactly once


def test_strip_full_duplicate_empties_copy(spark):
    """A verbatim full copy of an earlier doc strips to empty text —
    the one-canonical-occurrence guarantee."""
    from football_data_pipeline_spark.operators.substring import strip_dup_spans

    body = _w("z", 15)
    docs = _docs(spark, [(7, body), (9, body)])
    out = {r.doc_id: r.text for r in strip_dup_spans(docs, K).collect()}
    assert out[7] == body and out[9] == ""


def test_release_builder_substring_stage(spark, tmp_path):
    """build_release(strip_substrings=True): the shipped shards carry
    trimmed text for non-owner docs; accounting (n_chars) matches the
    trimmed text."""
    import glob

    import pandas as pd

    from football_data_pipeline_spark.operators.release import build_release

    # pads are positive-weight words under the quality gate's hashed
    # model so both docs survive to the shards; the shared run is the
    # only >=8-word text the docs have in common
    shared = " ".join(f"dupword{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "nice data query value beta " + shared, "en", "web"),
            (2, shared + " test delta nice data query value", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    path = str(tmp_path / "rel")
    build_release(docs, path, strip_substrings=True)
    files = glob.glob(f"{path}/shards/**/*.parquet", recursive=True)
    shipped = pd.concat([pd.read_parquet(f) for f in files])
    by_id = dict(zip(shipped.doc_id, shipped.text))
    assert shared in by_id[1]  # owner keeps the run
    assert "dupword0" not in by_id[2]  # copy trimmed
    assert by_id[2] == "test delta nice data query value"
    nchars = dict(zip(shipped.doc_id, shipped.n_chars))
    assert nchars[2] == len(by_id[2])


def test_exact_decontam_planted_leak(spark):
    """A train doc quoting 9 benchmark words verbatim is flagged with
    exactly that span; paraphrase and clean docs are not; eval docs
    never flag themselves."""
    from football_data_pipeline_spark.operators.substring import eval_gram_leaks

    bench = "the quick brown fox jumps over the lazy dog every single day"
    ev = _docs(spark, [(100, bench)])
    train = _docs(
        spark,
        [
            # quotes words 0..8 of the benchmark (9 words ≥ k=5)
            (1, _w("a", 4) + " the quick brown fox jumps over the lazy dog"),
            # paraphrase — no 5-gram collision
            (2, "a fast brown fox leaps over one lazy dog each day"),
            (3, _w("c", 12)),
        ],
    )
    got = {r.doc_id: r for r in eval_gram_leaks(train, ev, K).collect()}
    assert set(got) == {1}
    assert got[1].n_leaked_spans == 1 and got[1].leaked_words == 9
    assert got[1].max_span_len == 9 and got[1].n_words == 13


def test_strip_uncut_doc_is_byte_verbatim(spark):
    """An uncut doc keeps its exact original bytes — odd whitespace
    and all (cut docs are rebuilt single-spaced by construction)."""
    from football_data_pipeline_spark.operators.substring import strip_dup_spans

    odd = "a  double  spaced   doc " + _w("u", 8)
    docs = _docs(spark, [(1, odd), (2, None)])
    out = {r.doc_id: r.text for r in strip_dup_spans(docs, K).collect()}
    assert out[1] == odd
    assert out[2] is None


def test_source_substring_overlap_planted(spark):
    """A 10-word quote shared between src A and B yields exactly the
    6 shared 5-grams; the pair appears once (a < b); containment is
    against the smaller gram set."""
    from football_data_pipeline_spark.operators.substring import (
        source_substring_overlap,
    )

    quote = _w("q", 10)
    docs = spark.createDataFrame(
        [
            (1, quote + " " + _w("a", 10), "A"),
            (2, _w("b", 3) + " " + quote, "B"),
            (3, _w("z", 20), "C"),
        ],
        "doc_id long, text string, source string",
    )
    rows = source_substring_overlap(docs, K).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.source_a, r.source_b) == ("A", "B")
    assert r.shared_grams == 6  # 10-word run → 10-5+1 shared 5-grams
    assert r.grams_a == 16 and r.grams_b == 9
    assert r.containment == round(6 / 9, 4)
