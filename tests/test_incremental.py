"""Incremental view maintenance: full-then-incremental refreshes
equal a straight recompute, refreshes are no-ops when fresh, view
markers carry base-table lineage, the view itself time-travels, and
the merge handles one-sided groups. The merge arithmetic is
oracle-checked as q_incremental_view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.sources.incremental import (
    delta_aggregate,
    merge_view,
    reflected_table_version,
    refresh_view,
)
from football_data_pipeline_spark.sources.snapshots import (
    read_snapshot,
    snapshot_append_writer,
)

MEASURES = [("sum", "v", "sum_v"), ("min", "v", "min_v"), ("max", "v", "max_v")]


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )


def _state(spark, log, data):
    rows = read_snapshot(spark, log).collect()
    return {r.k: (r.n_rows, r.sum_v, r.min_v, r.max_v) for r in rows}


def _expected(spark, lo, hi):
    rows = (
        delta_aggregate(_batch(spark, lo, hi), ["k"], MEASURES)
        .collect()
    )
    return {r.k: (r.n_rows, r.sum_v, r.min_v, r.max_v) for r in rows}


def test_refresh_full_then_incremental_equals_recompute(spark, tmp_path):
    tlog, tdata = str(tmp_path / "tlog"), str(tmp_path / "tdata")
    vlog, vdata = str(tmp_path / "vlog"), str(tmp_path / "vdata")
    write = snapshot_append_writer(tlog, tdata, ["v"])
    write(_batch(spark, 0, 40).coalesce(1), 0)
    r1 = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r1["mode"] == "full"
    assert _state(spark, vlog, vdata) == _expected(spark, 0, 40)

    write(_batch(spark, 40, 100).coalesce(1), 1)
    write(_batch(spark, 100, 130).coalesce(1), 2)
    r2 = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r2["mode"] == "incremental"
    assert _state(spark, vlog, vdata) == _expected(spark, 0, 130)


def test_crashed_refresh_retries_cleanly(spark, tmp_path):
    """ADVICE r10 (medium): a crash between the ref-N state write
    and commit_snapshot leaves an orphan ref-N dir. The retry must
    number PAST the debris (not recompute the same N and die on
    errorifexists) — the view must never wedge."""
    import os

    tlog, tdata = str(tmp_path / "tlog"), str(tmp_path / "tdata")
    vlog, vdata = str(tmp_path / "vlog"), str(tmp_path / "vdata")
    write = snapshot_append_writer(tlog, tdata, ["v"])
    write(_batch(spark, 0, 40).coalesce(1), 0)
    refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    write(_batch(spark, 40, 100).coalesce(1), 1)
    # simulate the crashed refresh: its state landed at the number a
    # committed-versions-derived scheme would reuse, but no view
    # version was ever committed for it
    orphan = os.path.join(vdata, "ref-1")
    _batch(spark, 0, 3).coalesce(1).write.parquet(orphan)
    r = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r["mode"] == "incremental"
    assert _state(spark, vlog, vdata) == _expected(spark, 0, 100)
    # the debris is untouched, unreferenced garbage — not the view
    assert os.path.isdir(orphan)
    assert os.path.isdir(os.path.join(vdata, "ref-2"))


def test_refresh_noop_when_fresh(spark, tmp_path):
    tlog, tdata = str(tmp_path / "tlog"), str(tmp_path / "tdata")
    vlog, vdata = str(tmp_path / "vlog"), str(tmp_path / "vdata")
    write = snapshot_append_writer(tlog, tdata, ["v"])
    write(_batch(spark, 0, 20).coalesce(1), 0)
    refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    r = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r["mode"] == "noop" and r["view_version"] is None


def test_view_lineage_and_time_travel(spark, tmp_path):
    tlog, tdata = str(tmp_path / "tlog"), str(tmp_path / "tdata")
    vlog, vdata = str(tmp_path / "vlog"), str(tmp_path / "vdata")
    write = snapshot_append_writer(tlog, tdata, ["v"])
    write(_batch(spark, 0, 20).coalesce(1), 0)
    refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    write(_batch(spark, 20, 60).coalesce(1), 1)
    refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    # lineage: latest view marker points at table version 1
    assert reflected_table_version(spark, vlog) == 1
    # the view time-travels: version 0 still shows the 20-row state
    v0 = {
        r.k: r.n_rows for r in read_snapshot(spark, vlog, 0).collect()
    }
    v1 = {
        r.k: r.n_rows for r in read_snapshot(spark, vlog, 1).collect()
    }
    assert sum(v0.values()) == 20 and sum(v1.values()) == 60


def test_merge_view_one_sided_groups(spark):
    state = delta_aggregate(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        ["k"],
        MEASURES,
    )
    delta = delta_aggregate(
        spark.createDataFrame([(2, 2), (3, 30)], "k long, v long"),
        ["k"],
        MEASURES,
    )
    got = {
        r.k: (r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in merge_view(state, delta, ["k"], MEASURES).collect()
    }
    assert got[1] == (1, 10, 10, 10)  # state-only passes through
    assert got[3] == (1, 30, 30, 30)  # delta-only passes through
    assert got[2] == (2, 22, 2, 20)  # merged: add, least, greatest


def test_non_mergeable_measure_raises(spark):
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError, match="not mergeable"):
        delta_aggregate(df, ["k"], [("avg", "v", "avg_v")])


def test_e2e_readstream_appends_then_view_refresh(spark, tmp_path):
    """A real file-source stream drives snapshot_append_writer in two
    micro-batches; refresh_view ticks between runs stay equal to a
    straight recompute — the full append->commit->delta->merge path
    with no hand-fed batches."""
    import json as _json
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [{"k": i % 5, "v": i} for i in range(40)]
    rows2 = [{"k": i % 5, "v": i} for i in range(40, 130)]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    now = time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))

    tlog, tdata = str(tmp_path / "tlog"), str(tmp_path / "tdata")
    vlog, vdata = str(tmp_path / "vlog"), str(tmp_path / "vdata")
    write = snapshot_append_writer(tlog, tdata, ["v"])

    def run_stream():
        stream = spark.readStream.schema("k long, v long").json(str(src))
        q = (
            stream.writeStream.foreachBatch(write)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_stream()
    r1 = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r1["mode"] == "full"
    assert _state(spark, vlog, vdata) == _expected(spark, 0, 40)

    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    run_stream()
    r2 = refresh_view(spark, tlog, vlog, vdata, ["k"], MEASURES)
    assert r2["mode"] == "incremental"
    assert _state(spark, vlog, vdata) == _expected(spark, 0, 130)
