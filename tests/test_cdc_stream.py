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
