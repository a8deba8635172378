"""Streaming CDC materialized view: snapshot parity with the batch
operator, out-of-order safety across batches, crash-replay
idempotence, compaction re-basing, and the seq guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.cdc import apply_changes
from football_data_pipeline_spark.streaming.cdc_stream import (
    cdc_log_batch_writer,
    read_cdc_snapshot,
)

CHG_SCHEMA = "k long, seq long, op string, v string"
BASE_SCHEMA = "k long, v string"


def _chg(spark, rows):
    return spark.createDataFrame(rows, CHG_SCHEMA)


def _snap(spark, root, base=None, **kw):
    out = read_cdc_snapshot(spark, str(root), "k", ["v"], base=base, **kw)
    return {r.k: r.v for r in out.select("k", "v").collect()}


def test_snapshot_matches_batch_apply_and_handles_out_of_order(spark, tmp_path):
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"])
    b0 = [(1, 10, "U", "a"), (2, 10, "U", "b"), (3, 10, "U", "c")]
    b1 = [
        (2, 20, "D", None),   # delete
        (3, 5, "U", "stale"),  # LATE lower-seq change: must lose
        (4, 20, "U", "d"),    # insert
    ]
    w(_chg(spark, b0), 0)
    w(_chg(spark, b1), 1)
    assert _snap(spark, root) == {1: "a", 3: "c", 4: "d"}
    # parity with the batch operator over the concatenated log
    batch = apply_changes(
        spark.createDataFrame([], BASE_SCHEMA),
        _chg(spark, b0 + b1),
        "k",
        "seq",
        "op",
        ["v"],
    )
    assert {r.k: r.v for r in batch.collect()} == _snap(spark, root)


def test_replay_of_last_batch_is_idempotent(spark, tmp_path):
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 1, "U", "a")]), 0)
    b1 = _chg(spark, [(1, 2, "U", "a2"), (2, 2, "U", "b")])
    w(b1, 1)
    first = _snap(spark, root)
    w(b1, 1)  # crash-restart re-runs the last batch
    assert _snap(spark, root) == first == {1: "a2", 2: "b"}


def test_base_and_compaction_rebase_preserve_monotonicity(spark, tmp_path):
    root1 = tmp_path / "cdc1"
    w1 = cdc_log_batch_writer(str(root1), "k", "seq", "op", ["v"])
    base = spark.createDataFrame([(1, "old"), (9, "keep")], BASE_SCHEMA)
    w1(_chg(spark, [(1, 50, "U", "new")]), 0)
    assert _snap(spark, root1, base=base) == {1: "new", 9: "keep"}
    # compaction: materialize WITH __seq as the new base
    compacted = read_cdc_snapshot(
        spark, str(root1), "k", ["v"], base=base, keep_seq=True
    )
    rebased = compacted.collect()
    assert {(r.k, r.v) for r in rebased} == {(1, "new"), (9, "keep")}
    root2 = tmp_path / "cdc2"
    w2 = cdc_log_batch_writer(str(root2), "k", "seq", "op", ["v"])
    # a LATE change older than the compacted winner must still lose
    w2(_chg(spark, [(1, 10, "U", "stale")]), 0)
    assert _snap(
        spark, root2, base=spark.createDataFrame(rebased)
    ) == {1: "new", 9: "keep"}


def test_negative_seq_rejected_and_empty_state_errors(spark, tmp_path):
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"])
    with pytest.raises(Exception, match="cdc seq must be >= 0"):
        w(_chg(spark, [(1, -1, "U", "a")]), 0)
    with pytest.raises(ValueError, match="no log yet"):
        read_cdc_snapshot(spark, str(tmp_path / "none"), "k", ["v"])


def _log_parts(root):
    log = root / "log"
    if not log.is_dir():
        return []
    return sorted(p.name for p in log.iterdir() if p.name.startswith("batch_id="))


def test_auto_compaction_triggers_at_k_and_parity_holds(spark, tmp_path):
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(
        str(root), "k", "seq", "op", ["v"], compact_every=3
    )
    w(_chg(spark, [(1, 10, "U", "a"), (2, 10, "U", "b")]), 0)
    w(_chg(spark, [(2, 20, "D", None)]), 1)
    assert len(_log_parts(root)) == 2 and not (root / "base").is_dir()
    # batch 3 brings the log to K=3 partitions -> rebase fires
    w(_chg(spark, [(3, 30, "U", "c")]), 2)
    assert (root / "base").is_dir()
    assert _log_parts(root) == []
    assert _snap(spark, root) == {1: "a", 3: "c"}
    # the compacted base keeps the winning __seq AND the tombstone
    managed = spark.read.parquet(str(root / "base"))
    rows = {r["k"]: (r["__seq"], r["__op"]) for r in managed.collect()}
    assert rows == {1: (10, "U"), 2: (20, "D"), 3: (30, "U")}


def test_late_low_seq_update_loses_after_rebase_even_for_deleted_key(
    spark, tmp_path
):
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(
        str(root), "k", "seq", "op", ["v"], compact_every=2
    )
    w(_chg(spark, [(1, 50, "U", "live")]), 0)
    w(_chg(spark, [(2, 60, "D", None)]), 1)  # triggers rebase at K=2
    assert _log_parts(root) == []
    # a LATE lower-seq 'U' for the DELETED key arrives after the
    # rebase: the retained tombstone must still win
    w(_chg(spark, [(2, 10, "U", "ghost"), (1, 20, "U", "stale")]), 2)
    assert _snap(spark, root) == {1: "live"}
    # ...and a genuinely newer 'U' resurrects it
    w(_chg(spark, [(2, 70, "U", "back")]), 3)  # triggers 2nd rebase
    assert _snap(spark, root) == {1: "live", 2: "back"}


def test_interrupted_compaction_is_idempotent(spark, tmp_path):
    from football_data_pipeline_spark.streaming.cdc_stream import (
        compact_cdc_log,
    )

    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 10, "U", "a"), (2, 20, "D", None)]), 0)
    w(_chg(spark, [(3, 30, "U", "c")]), 1)
    n = compact_cdc_log(spark, str(root), "k", ["v"])
    assert n == 2
    before = _snap(spark, root)
    # simulate the crash window: winners exist in base AND a replayed
    # log partition (cleanup died) — the fold must absorb duplicates
    w(_chg(spark, [(3, 30, "U", "c")]), 1)
    assert _snap(spark, root) == before == {1: "a", 3: "c"}
    assert compact_cdc_log(spark, str(root), "k", ["v"]) == 1
    assert _snap(spark, root) == before
    # nothing left to fold
    assert compact_cdc_log(spark, str(root), "k", ["v"]) == 0


def test_crashed_base_swap_recovers_on_read_and_compaction(spark, tmp_path):
    """ADVICE r6 regression: a crash between _swap_rewrite's two
    renames leaves {root}/base missing with the sole copy at
    base.__merge_old__. The reader must restore it (NOT serve a
    log-only snapshot), and a subsequent compaction must fold the
    restored base (NOT write the log-only fold as the new base,
    which made the loss permanent)."""
    import shutil

    from football_data_pipeline_spark.streaming.cdc_stream import (
        compact_cdc_log,
    )

    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 10, "U", "a"), (2, 10, "U", "b")]), 0)
    assert compact_cdc_log(spark, str(root), "k", ["v"]) == 1
    w(_chg(spark, [(3, 20, "U", "c")]), 1)
    # simulate the crash window: base renamed aside, new base never
    # moved into place
    base = root / "base"
    shutil.move(str(base), str(root / "base.__merge_old__"))
    assert not base.exists()
    # read path restores the orphan instead of serving log-only state
    assert _snap(spark, root) == {1: "a", 2: "b", 3: "c"}
    assert base.exists() and not (root / "base.__merge_old__").exists()
    # crash again, this time recover via the compaction entry point
    shutil.move(str(base), str(root / "base.__merge_old__"))
    assert compact_cdc_log(spark, str(root), "k", ["v"]) == 1
    assert _snap(spark, root) == {1: "a", 2: "b", 3: "c"}
    assert not (root / "base.__merge_old__").exists()


def test_uncompacted_log_warns_past_threshold(spark, tmp_path, monkeypatch):
    """VERDICT r6 #5: compaction is now on by default; explicitly
    disabling it must warn loudly once the committed log passes the
    threshold instead of growing silently."""
    import warnings as warnings_mod

    from football_data_pipeline_spark.streaming import cdc_stream

    monkeypatch.setattr(cdc_stream, "UNCOMPACTED_WARN_THRESHOLD", 2)
    root = tmp_path / "cdc"
    w = cdc_log_batch_writer(str(root), "k", "seq", "op", ["v"], compact_every=None)
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")  # no warning below threshold
        w(_chg(spark, [(1, 1, "U", "a")]), 0)
    with pytest.warns(RuntimeWarning, match="uncompacted"):
        w(_chg(spark, [(2, 2, "U", "b")]), 1)
    # the default is compaction-on (a real value, not None)
    assert cdc_stream.DEFAULT_COMPACT_EVERY >= 1
    import inspect

    sig = inspect.signature(cdc_log_batch_writer)
    assert sig.parameters["compact_every"].default == cdc_stream.DEFAULT_COMPACT_EVERY
    # and the compaction-on path folds at K instead of warning
    root2 = tmp_path / "cdc2"
    w2 = cdc_log_batch_writer(str(root2), "k", "seq", "op", ["v"], compact_every=2)
    w2(_chg(spark, [(1, 1, "U", "a")]), 0)
    w2(_chg(spark, [(2, 2, "U", "b")]), 1)
    assert (root2 / "base").exists()
    assert _snap(spark, root2) == {1: "a", 2: "b"}


# --- snapshot-log-backed variant (VERDICT r11 item 4, r12) --------------


def _snap_log(spark, root, base=None, **kw):
    from football_data_pipeline_spark.streaming.cdc_stream import (
        read_cdc_snapshot_log,
    )

    out = read_cdc_snapshot_log(spark, str(root), "k", ["v"], base=base, **kw)
    return {r.k: r.v for r in out.select("k", "v").collect()}


def test_cdc_snapshot_writer_twin_run_parity(spark, tmp_path):
    """The snapshot-backed CDC writer must materialize the IDENTICAL
    view the partition-backed writer does over the same batch
    sequence — including the out-of-order loss and the delete."""
    from football_data_pipeline_spark.streaming.cdc_stream import (
        cdc_snapshot_writer,
    )

    b0 = [(1, 10, "U", "a"), (2, 10, "U", "b"), (3, 10, "U", "c")]
    b1 = [(2, 20, "D", None), (3, 5, "U", "stale"), (4, 20, "U", "d")]
    r_a = tmp_path / "partition"
    r_b = tmp_path / "snapshot"
    wa = cdc_log_batch_writer(str(r_a), "k", "seq", "op", ["v"])
    wb = cdc_snapshot_writer(str(r_b), "k", "seq", "op", ["v"])
    for w in (wa, wb):
        w(_chg(spark, b0), 0)
        w(_chg(spark, b1), 1)
    assert _snap(spark, r_a) == _snap_log(spark, r_b) == {1: "a", 3: "c", 4: "d"}


def test_cdc_snapshot_writer_replay_and_seq_guard(spark, tmp_path):
    """Replay of the last batch is a guarded no-op (no new version);
    the in-plan seq guard still fires through the snapshot path."""
    from football_data_pipeline_spark.sources.snapshots import (
        snapshot_versions,
    )
    from football_data_pipeline_spark.streaming.cdc_stream import (
        cdc_snapshot_writer,
    )

    root = tmp_path / "cdc"
    w = cdc_snapshot_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 1, "U", "a")]), 0)
    b1 = _chg(spark, [(1, 2, "U", "a2"), (2, 2, "U", "b")])
    w(b1, 1)
    first = _snap_log(spark, root)
    n = len(snapshot_versions(spark, f"{root}/winners_log"))
    w(b1, 1)  # crash-restart re-runs the last batch
    assert _snap_log(spark, root) == first == {1: "a2", 2: "b"}
    assert len(snapshot_versions(spark, f"{root}/winners_log")) == n
    with pytest.raises(Exception, match="cdc seq must be >= 0"):
        w(_chg(spark, [(9, -1, "U", "x")]), 2)


def test_cdc_snapshot_fold_keeps_tombstones_and_monotonicity(spark, tmp_path):
    """The COW fold (compact_cdc_snapshot) collapses to one row per
    key, KEEPS 'D' tombstones and winning seqs (a late lower-seq 'U'
    still loses after the fold — even for a deleted key), carries the
    batch watermark, and leaves old versions time-travelable."""
    from football_data_pipeline_spark.sources.snapshots import (
        latest_committed_batch,
        read_snapshot,
        snapshot_versions,
    )
    from football_data_pipeline_spark.streaming.cdc_stream import (
        cdc_snapshot_writer,
        compact_cdc_snapshot,
    )

    root = tmp_path / "cdc"
    log = f"{root}/winners_log"
    w = cdc_snapshot_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 10, "U", "a"), (2, 10, "U", "b")]), 0)
    w(_chg(spark, [(1, 20, "U", "a2"), (2, 30, "D", None)]), 1)
    pre_fold = _snap_log(spark, root)
    assert pre_fold == {1: "a2"}
    v = compact_cdc_snapshot(spark, str(root), "k", ["v"])
    # folded table: one row per key, tombstone retained with its seq
    rows = {
        r["k"]: (r["__seq"], r["__op"])
        for r in read_snapshot(spark, log).collect()
    }
    assert rows == {1: (20, "U"), 2: (30, "D")}
    assert _snap_log(spark, root) == pre_fold
    # watermark carried: the replay guard survives the fold
    assert latest_committed_batch(spark, log) == 1
    w(_chg(spark, [(1, 20, "U", "a2"), (2, 30, "D", None)]), 1)  # replay
    assert snapshot_versions(spark, log)[-1] == v
    # late lower-seq changes still lose — including for the deleted key
    w(_chg(spark, [(1, 15, "U", "stale"), (2, 25, "U", "resurrect")]), 2)
    assert _snap_log(spark, root) == {1: "a2"}
    # pre-fold versions remain one pin away
    assert {
        r.k
        for r in read_snapshot(spark, log, version=0).collect()
    } == {1, 2}


def test_crashed_fold_retry_takes_fresh_gen_dir(spark, tmp_path):
    """A crash between the fold's parquet write and its commit leaves
    a gen-N dir with no matching snap dir (ADVICE r12); the retry
    must number PAST the debris instead of colliding with
    mode('errorifexists') and failing permanently."""
    import os

    from football_data_pipeline_spark.streaming.cdc_stream import (
        cdc_snapshot_writer,
        compact_cdc_snapshot,
    )

    root = tmp_path / "cdc"
    w = cdc_snapshot_writer(str(root), "k", "seq", "op", ["v"])
    w(_chg(spark, [(1, 10, "U", "a"), (2, 10, "U", "b")]), 0)
    w(_chg(spark, [(1, 20, "U", "a2")]), 1)
    pre = _snap_log(spark, root)
    # simulate the crashed fold: the gen the snap-dir numbering alone
    # would pick (max snap + 1) already exists as debris
    debris = root / "winners_fold" / "gen-2"
    os.makedirs(debris)
    (debris / "_started").write_text("crashed before commit")
    v = compact_cdc_snapshot(spark, str(root), "k", ["v"])
    assert v is not None
    assert _snap_log(spark, root) == pre
    # the retry took a FRESH dir past the debris, which is untouched
    assert (debris / "_started").read_text() == "crashed before commit"
    assert (root / "winners_fold" / "gen-3").is_dir()
