"""History compaction for the streaming funnels (r7): the
accepted/gram_index/sig_index dirs previously grew one batch_id
partition per micro-batch forever — the same unbounded read
amplification the CDC stream fixed. compact_history folds committed
partitions into a base that KEEPS batch_id as a column, so the
``batch_id < N`` exactly-once replay pruning applies unchanged, and
the reader's base-max predicate keeps every crash window correct.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.streaming.pipeline import (
    _list_batch_partitions,
    _read_history,
    compact_history,
    dedup_batch_writer,
)

import pytest as _pytest_r14

# r14 slow tier: multi-minute e2e file — excluded from the default
# (driver-window) run by pytest.ini; the full suite (-m "") runs it.
pytestmark = _pytest_r14.mark.slow

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web") for i, t in rows], DOC_SCHEMA
    )


def _classified(spark, root, batch_id):
    return {
        r.doc_id: r.dup_kind
        for r in spark.read.parquet(
            f"{root}/classification/batch_id={batch_id}"
        ).collect()
    }


UNIQUE_TEXTS = [
    (i, f"totally distinct document number {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
    for i in range(12)
]


def test_compaction_preserves_classification_parity(spark, tmp_path):
    """Twin runs — compact_every=2 vs compaction off — must classify
    every batch identically, while the compacted side's live
    partition list stays bounded and the base holds the history."""
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    wa = dedup_batch_writer(ra, compact_every=2)
    wb = dedup_batch_writer(rb, compact_every=None)
    batches = [
        UNIQUE_TEXTS[0:3],
        UNIQUE_TEXTS[3:6] + [UNIQUE_TEXTS[1]],  # dup of batch-0 doc
        UNIQUE_TEXTS[6:9] + [UNIQUE_TEXTS[4]],  # dup of batch-1 doc
        UNIQUE_TEXTS[9:12] + [UNIQUE_TEXTS[7]],  # dup of batch-2 doc
    ]
    for i, rows in enumerate(batches):
        wa(_docs(spark, rows), i)
        wb(_docs(spark, rows), i)
        assert _classified(spark, ra, i) == _classified(spark, rb, i)
    # compacted side: bounded live partitions + a base with history
    live = _list_batch_partitions(spark, ra, "accepted")
    assert len(live) < 4 and max(live) == 3  # current batch stays live
    base = spark.read.parquet(f"{ra}/accepted.__hist_base__")
    assert "batch_id" in base.columns
    # the two histories agree row-for-row at the next batch id
    ha = _read_history(spark, ra, "accepted", 4)
    hb = _read_history(spark, rb, "accepted", 4)
    assert sorted(r.doc_id for r in ha.collect()) == sorted(
        r.doc_id for r in hb.collect()
    )


def test_replay_of_current_batch_after_compaction_is_idempotent(spark, tmp_path):
    """Compaction folds only batches BELOW the current one, so a
    crash-restart replaying batch N still prunes its own partial
    output (batch_id < N) and classifies identically."""
    root = str(tmp_path / "c")
    w = dedup_batch_writer(root, compact_every=2)
    w(_docs(spark, UNIQUE_TEXTS[0:3]), 0)
    b1 = _docs(spark, UNIQUE_TEXTS[3:5] + [UNIQUE_TEXTS[2]])
    w(b1, 1)  # triggers compaction of batch 0
    first = _classified(spark, root, 1)
    w(b1, 1)  # replay
    assert _classified(spark, root, 1) == first
    assert first[UNIQUE_TEXTS[2][0]] != "unique"  # history still seen


def test_crashed_cleanup_never_double_counts(spark, tmp_path):
    """Crash window: base swapped in but a folded partition's delete
    never ran. The reader's base-max predicate must hide the
    duplicate copy, and the next compaction removes it."""
    root = str(tmp_path / "d")
    w = dedup_batch_writer(root, compact_every=None)
    w(_docs(spark, UNIQUE_TEXTS[0:3]), 0)
    w(_docs(spark, UNIQUE_TEXTS[3:5]), 1)
    assert compact_history(spark, root, "accepted", upto_exclusive=2) == 2
    # simulate the failed cleanup: resurrect batch 0's folded copy
    hist_rows = _read_history(spark, root, "accepted", 99).count()
    base = f"{root}/accepted.__hist_base__"
    spark.read.parquet(base).filter(F.col("batch_id") == 0).drop(
        "batch_id"
    ).write.mode("overwrite").parquet(f"{root}/accepted/batch_id=0")
    assert _read_history(spark, root, "accepted", 99).count() == hist_rows
    # next compaction clears the leftover without re-folding it
    assert compact_history(spark, root, "accepted", upto_exclusive=3) == 0
    assert _list_batch_partitions(spark, root, "accepted") == []
    assert _read_history(spark, root, "accepted", 99).count() == hist_rows


def test_crashed_base_swap_recovers_on_read(spark, tmp_path):
    """A crash between the base swap's renames leaves the base at
    .__merge_old__; the next history read restores it instead of
    serving live-only history."""
    root = str(tmp_path / "e")
    w = dedup_batch_writer(root, compact_every=None)
    w(_docs(spark, UNIQUE_TEXTS[0:3]), 0)
    w(_docs(spark, UNIQUE_TEXTS[3:5]), 1)
    compact_history(spark, root, "accepted", upto_exclusive=2)
    base = f"{root}/accepted.__hist_base__"
    shutil.move(base, base + ".__merge_old__")
    hist = _read_history(spark, root, "accepted", 99)
    assert hist.count() == 5  # restored, not empty
    import os

    assert os.path.exists(base)
    assert not os.path.exists(base + ".__merge_old__")


def test_vector_writer_compacts_sig_index(spark, tmp_path):
    """The vector funnel folds its sig_index on the same cadence and
    the screen's decisions are unchanged by compaction."""
    from football_data_pipeline_spark.streaming.vectors import (
        vector_ingest_batch_writer,
    )

    def vec(axis, scale=1.0):
        v = [0.0] * 64
        for i in range(axis, axis + 8):
            v[i] = scale
        return v

    ra, rb = str(tmp_path / "va"), str(tmp_path / "vb")
    wa = vector_ingest_batch_writer(ra, compact_every=2)
    wb = vector_ingest_batch_writer(rb, compact_every=None)
    batches = [
        [(1, vec(0)), (2, vec(8))],
        [(3, vec(16)), (4, vec(0, 2.0))],  # 4 dups 1 (cosine 1.0)
        [(5, vec(8, 3.0)), (6, vec(24))],  # 5 dups 2
    ]
    for i, rows in enumerate(batches):
        wa(spark.createDataFrame(rows, "vec_id long, embedding array<float>"), i)
        wb(spark.createDataFrame(rows, "vec_id long, embedding array<float>"), i)
    for root in (ra, rb):
        rej = {
            r.vec_id: r.dup_of
            for r in spark.read.option("basePath", f"{root}/rejected")
            .parquet(f"{root}/rejected")
            .collect()
        }
        assert rej == {4: 1, 5: 2}
    assert len(_list_batch_partitions(spark, ra, "sig_index")) < 3
    assert spark.read.parquet(f"{ra}/sig_index.__hist_base__").count() > 0


def test_compact_every_validated(tmp_path):
    with pytest.raises(ValueError, match="compact_every"):
        dedup_batch_writer(str(tmp_path), compact_every=0)


def test_base_max_marker_written_and_healed(spark, tmp_path):
    """ADVICE r7: the reader must not run a max-aggregate Spark job
    per micro-batch. After compaction a ``_base_max`` marker inside
    the base carries the max batch_id; deleting it (the
    crash-between-swap-and-marker-write state) makes the next read
    fall back to the aggregate AND heal the marker, with identical
    history either way."""
    from football_data_pipeline_spark.streaming.pipeline import (
        _read_base_max,
    )

    root = str(tmp_path / "c")
    w = dedup_batch_writer(root, compact_every=None)
    for b in range(3):
        w(_docs(spark, UNIQUE_TEXTS[b * 3 : b * 3 + 3]), b)
    compact_history(spark, root, "accepted", upto_exclusive=2)
    base = f"{root}/accepted.__hist_base__"
    assert _read_base_max(spark, base) == 1  # batches 0,1 folded

    rows = _read_history(spark, root, "accepted", 99).count()
    # crash window: marker missing -> aggregate fallback + heal
    import os

    os.remove(f"{base}/_base_max")
    assert _read_base_max(spark, base) is None
    assert _read_history(spark, root, "accepted", 99).count() == rows
    assert _read_base_max(spark, base) == 1  # healed

    # a further compaction swaps the dir: marker must track the swap
    w(_docs(spark, UNIQUE_TEXTS[9:12]), 3)
    compact_history(spark, root, "accepted", upto_exclusive=3)
    assert _read_base_max(spark, base) == 2
    assert _read_history(spark, root, "accepted", 99).count() == rows + 3
