"""Keep-best streaming dedup (streaming/supersede.py): a
higher-quality arrival supersedes its accepted owner (tombstone +
acceptance), worse/tie arrivals reject as usual, the probe always
compares against the LIVE owner, and replay is idempotent.

Fixture arithmetic (quality.classify_quality token weights): the
10-greek-word ``BASE`` has mean -0.228; appending 'sludge' (+0.992)
raises it, appending 'yyy' (-0.788) lowers it, and REPEATING an
existing word ('beta', +0.813) changes the mean without changing the
word set — an exact-fingerprint dup with a different score.
"""

from __future__ import annotations

from football_data_pipeline_spark.streaming.supersede import (
    keep_best_batch_writer,
    read_live_corpus,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], SCHEMA
    )


def _read(spark, root, sub):
    return spark.read.option("basePath", f"{root}/{sub}").parquet(f"{root}/{sub}")


def test_better_near_copy_supersedes_and_owner_stays_live(spark, tmp_path):
    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root)
    w(_df(spark, [(1, BASE)]), 0)
    # better near copy (jaccard 10/11, higher mean) supersedes doc 1
    w(_df(spark, [(11, BASE + " sludge")]), 1)
    tomb = {r.doc_id: r for r in _read(spark, root, "tombstones").collect()}
    assert set(tomb) == {1}
    assert tomb[1].superseded_by == 11 and tomb[1].new_score > tomb[1].score
    acc = {r.doc_id for r in _read(spark, root, "accepted").collect()}
    assert acc == {1, 11}  # raw partitions keep history; the VIEW prunes
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {11}
    # batch 2: a copy of the ORIGINAL text must be judged against the
    # LIVE owner 11 (not the tombstoned 1) — and it scores lower
    w(_df(spark, [(21, BASE)]), 2)
    rej = {r.doc_id: r for r in _read(spark, root, "rejected").collect()}
    assert rej[21].dup_of == 11 and rej[21].reason == "duplicate_not_better"
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {11}


def test_worse_and_tie_arrivals_keep_incumbent(spark, tmp_path):
    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root)
    w(_df(spark, [(1, BASE + " sludge")]), 0)
    # 11: near copy with an extra LOW-weight word (worse); 12: exact
    # same text (tie) — both reject, nothing tombstoned. Separate
    # batches: in ONE batch they'd collapse against each other
    # within-batch before ever reaching history classification
    # (the base funnel's min-id rule, deliberately unchanged here).
    w(_df(spark, [(11, BASE + " sludge yyy")]), 1)
    w(_df(spark, [(12, BASE + " sludge")]), 2)
    rej = {r.doc_id: r for r in _read(spark, root, "rejected").collect()}
    assert set(rej) == {11, 12}
    assert all(r.dup_of == 1 for r in rej.values())
    assert _read(spark, root, "tombstones").count() == 0
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {1}


def test_exact_dup_with_better_score_supersedes(spark, tmp_path):
    """Repeating a high-weight word changes the mean but not the word
    SET — an exact-fingerprint dup that still wins on quality."""
    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root)
    w(_df(spark, [(1, BASE)]), 0)
    w(_df(spark, [(11, BASE + " beta beta")]), 1)
    cls = {
        r.doc_id: r for r in _read(spark, root, "classification").collect()
    }
    assert cls[11].dup_kind == "exact" and cls[11].matched_doc == 1
    tomb = {r.doc_id: r.superseded_by for r in _read(spark, root, "tombstones").collect()}
    assert tomb == {1: 11}
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {11}


def test_replay_idempotent(spark, tmp_path):
    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root)
    w(_df(spark, [(1, BASE)]), 0)
    batch1 = _df(spark, [(11, BASE + " sludge"), (12, "totally unrelated words entirely")])
    w(batch1, 1)
    snap = lambda: (  # noqa: E731
        {(r.doc_id, r.superseded_by) for r in _read(spark, root, "tombstones").collect()},
        {r.doc_id for r in _read(spark, root, "rejected").collect()},
        {r.doc_id for r in _read(spark, root, "accepted").collect()},
        {r.doc_id for r in read_live_corpus(spark, root).collect()},
    )
    before = snap()
    assert before[0] == {(1, 11)} and before[3] == {11, 12}
    # a replay of batch 1 must not see its own tombstones/accepted as
    # history — identical outputs
    w(batch1, 1)
    assert snap() == before


def test_tombstone_compaction_folds_and_liveness_survives(spark, tmp_path):
    """Both history tables compact on the cadence — tombstones are
    read every batch by the liveness prune, so they must fold too —
    and a FOLDED tombstone still hides its superseded doc from the
    probe."""
    import glob

    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root, compact_every=2)
    w(_df(spark, [(1, BASE)]), 0)
    w(_df(spark, [(11, BASE + " sludge")]), 1)  # supersedes 1 (near)
    # 21 repeats a high-weight word: SAME set as 11 (exact dup,
    # higher mean) — the chain's word set must not drift from BASE
    # or generation 3 would fall under the 0.9 verify vs doc 31
    w(_df(spark, [(21, BASE + " sludge beta beta")]), 2)
    # compaction ran on both tables: fewer live dirs than batches
    assert len(glob.glob(f"{root}/tombstones/batch_id=*")) < 3
    assert len(glob.glob(f"{root}/accepted/batch_id=*")) < 3
    # liveness after folding: a copy of the ORIGINAL text is judged
    # against the current owner 21, not the folded tombstoned 1/11
    w(_df(spark, [(31, BASE)]), 3)
    rej = {r.doc_id: r.dup_of for r in _read(spark, root, "rejected").collect()}
    assert rej[31] == 21
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {21}


def test_unique_docs_flow_through_untouched(spark, tmp_path):
    root = str(tmp_path / "c")
    w = keep_best_batch_writer(root)
    w(_df(spark, [(1, BASE), (2, "totally different words about football odds")]), 0)
    assert _read(spark, root, "tombstones").count() == 0
    assert _read(spark, root, "rejected").count() == 0
    assert {r.doc_id for r in read_live_corpus(spark, root).collect()} == {1, 2}
