"""Merge-on-read deletes: the MOR view equals the COW result, drop
files are pruned at planning, key deletes subtract everywhere, and
fold_deletes materializes to the same table the MOR view showed.
The planning audit is oracle-checked as q_mor_delete."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.sources.manifest import build_manifest
from football_data_pipeline_spark.sources.mor import (
    apply_deletes,
    fold_deletes,
    plan_mor_read,
    read_mor,
)
from football_data_pipeline_spark.sources.snapshots import delete_where_cow

import pytest as _pytest_r14

# r14 slow tier: multi-minute e2e file — excluded from the default
# (driver-window) run by pytest.ini; the full suite (-m "") runs it.
pytestmark = _pytest_r14.mark.slow

N = 800
RANGES = [(100, 199), (520, 569)]  # file-aligned + boundary-straddling


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def _table(spark, base, files=16):
    path = str(base / "tbl")
    df = spark.range(N).select(F.col("id"), (F.col("id") % 7).alias("v"))
    df.repartitionByRange(files, "id").write.parquet(path)
    return build_manifest(spark, path, ["id"])


def _expected(keys=()):
    out = []
    for i in range(N):
        if any(lo <= i <= hi for lo, hi in RANGES):
            continue
        if i in keys:
            continue
        out.append(i)
    return out


def test_read_mor_equals_cow(spark, tmp_path):
    m = _table(spark, tmp_path)
    got = _ids(read_mor(spark, m, "id", RANGES))
    assert got == _expected()
    # same survivors as paying the rewrite up front (one range)
    cow = delete_where_cow(
        spark, m, "id", RANGES[0][0], RANGES[0][1],
        out_dir=str(tmp_path / "cow"),
    )
    cow_ids = _ids(
        spark.read.parquet(*[r.file for r in cow.select("file").collect()])
    )
    assert [i for i in cow_ids if not (520 <= i <= 569)] == _expected()


def test_drop_files_pruned_before_io(spark, tmp_path):
    m = _table(spark, tmp_path)
    plan = plan_mor_read(m, "id", RANGES).select("file", "action").collect()
    actions = {r.file: r.action for r in plan}
    assert "drop" in set(actions.values())
    # 16 files x 50 rows: [100,199] covers files 2 and 3 exactly;
    # [520,569] straddles files 10/11 (filter class)
    dropped = {f for f, a in actions.items() if a == "drop"}
    assert len(dropped) == 2
    for f in dropped:
        rows = spark.read.parquet(f).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).first()
        assert any(lo <= rows.lo and rows.hi <= hi for lo, hi in RANGES)


def test_key_deletes_subtract_everywhere(spark, tmp_path):
    m = _table(spark, tmp_path)
    keys = spark.createDataFrame([(7,), (300,), (777,)], "id long")
    got = _ids(read_mor(spark, m, "id", RANGES, keys=keys))
    assert got == _expected(keys={7, 300, 777})


def test_fold_deletes_materializes_the_view(spark, tmp_path):
    m = _table(spark, tmp_path)
    keys = spark.createDataFrame([(7,), (300,)], "id long")
    view = _ids(read_mor(spark, m, "id", RANGES, keys=keys))
    folded = fold_deletes(
        spark, m, "id", RANGES, str(tmp_path / "fold"), keys=keys
    )
    got = _ids(
        spark.read.parquet(
            *[r.file for r in folded.select("file").collect()]
        )
    )
    assert got == view == _expected(keys={7, 300})


def test_fold_without_keys_carries_keep_files(spark, tmp_path):
    m = _table(spark, tmp_path)
    old_files = {r.file for r in m.select("file").collect()}
    plan = plan_mor_read(m, "id", RANGES).select("file", "action").collect()
    keeps = {r.file for r in plan if r.action == "keep"}
    drops = {r.file for r in plan if r.action == "drop"}
    folded = fold_deletes(spark, m, "id", RANGES, str(tmp_path / "fold"))
    new_files = {r.file for r in folded.select("file").collect()}
    assert keeps <= new_files  # keep-class passes through verbatim
    assert not (drops & new_files)  # drop-class gone without a read
    assert new_files - old_files  # filter-class rewritten fresh
    assert _ids(spark.read.parquet(*new_files)) == _expected()


def test_no_ranges_is_identity_modulo_keys(spark, tmp_path):
    m = _table(spark, tmp_path)
    keys = spark.createDataFrame([(0,), (1,)], "id long")
    got = _ids(read_mor(spark, m, "id", [], keys=keys))
    assert got == list(range(2, N))
    df = spark.range(5).select(F.col("id"))
    assert _ids(apply_deletes(df, "id", [])) == list(range(5))


# --- streaming retractions (equality-delete log) -----------------------


def _append(writer, spark, lo, hi, batch_id):
    df = spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    writer(df.coalesce(1), batch_id)


def test_retraction_pair_live_view_and_fold(spark, tmp_path):
    from football_data_pipeline_spark.sources.mor import (
        fold_retractions,
        latest_delete_keys,
        live_view,
    )
    from football_data_pipeline_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append_writer,
    )

    dlog, ddata = str(tmp_path / "dlog"), str(tmp_path / "ddata")
    rlog, rdata = str(tmp_path / "rlog"), str(tmp_path / "rdata")
    data_w = snapshot_append_writer(dlog, ddata, ["id"])
    del_w = snapshot_append_writer(rlog, rdata, ["id"])
    _append(data_w, spark, 0, 100, 0)
    _append(data_w, spark, 100, 200, 1)
    # two retraction micro-batches
    del_w(spark.createDataFrame([(5,), (50,)], "id long").coalesce(1), 0)
    del_w(spark.createDataFrame([(150,)], "id long").coalesce(1), 1)

    live = _ids(live_view(spark, dlog, rlog, "id"))
    assert live == [i for i in range(200) if i not in (5, 50, 150)]

    out = fold_retractions(spark, dlog, rlog, "id", str(tmp_path / "fold"))
    assert out["mode"] == "folded"
    # the fold changed nothing the reader can see...
    assert _ids(live_view(spark, dlog, rlog, "id")) == live
    # ...the delete log is reset...
    assert latest_delete_keys(spark, rlog, "id") is None
    # ...and pre-fold data versions still hold the deleted rows
    v1 = _ids(read_snapshot(spark, dlog, 1, base_path=ddata))
    assert 5 in v1 and 150 in v1
    # a fold with nothing pending is a no-op
    assert fold_retractions(
        spark, dlog, rlog, "id", str(tmp_path / "fold2")
    )["mode"] == "noop"


def test_retractions_after_fold_survive(spark, tmp_path):
    from football_data_pipeline_spark.sources.mor import (
        fold_retractions,
        live_view,
    )
    from football_data_pipeline_spark.sources.snapshots import (
        snapshot_append_writer,
    )

    dlog, ddata = str(tmp_path / "dlog"), str(tmp_path / "ddata")
    rlog, rdata = str(tmp_path / "rlog"), str(tmp_path / "rdata")
    data_w = snapshot_append_writer(dlog, ddata, ["id"])
    del_w = snapshot_append_writer(rlog, rdata, ["id"])
    _append(data_w, spark, 0, 50, 0)
    del_w(spark.createDataFrame([(1,)], "id long").coalesce(1), 0)
    fold_retractions(spark, dlog, rlog, "id", str(tmp_path / "fold"))
    # a retraction landing after the fold lives in its own version
    del_w(spark.createDataFrame([(2,)], "id long").coalesce(1), 1)
    assert _ids(live_view(spark, dlog, rlog, "id")) == [
        i for i in range(50) if i not in (1, 2)
    ]
