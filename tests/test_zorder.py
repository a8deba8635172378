"""Z-order clustering: the Morton kernel must match a bit-exact
Python reference, the clustered write must make a 2-D box prune
skip files a linear layout cannot, and the pruned box read must be
row-identical to the full scan + filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.sources.manifest import build_manifest
from football_data_pipeline_spark.sources.zorder import (
    GRID_MAX,
    _spark_shl,
    _z_sql,
    prune_files_box,
    read_box,
    write_zordered,
    zvalue_column,
)


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(gx: int, gy: int) -> int:
    return _py_spread(gx) | (_py_spread(gy) << 1)


SAMPLES = [
    (0, 0),
    (1, 0),
    (0, 1),
    (1, 1),
    (3, 5),
    (255, 256),
    (0xFFFF, 0),
    (0, 0xFFFF),
    (0xFFFF, 0xFFFF),
    (12345, 54321),
    (40000, 1),
]


def test_morton_kernel_matches_python_reference(spark):
    df = spark.createDataFrame(SAMPLES, "gx long, gy long").withColumn(
        "z", F.expr(_z_sql("gx", "gy", _spark_shl))
    )
    got = {(r.gx, r.gy): r.z for r in df.collect()}
    for gx, gy in SAMPLES:
        assert got[(gx, gy)] == _py_morton(gx, gy), (gx, gy)


def test_morton_quadrant_prefix():
    # the defining locality property: the two top grid bits become
    # the two top z bits, so a quadrant is one contiguous z range
    for gx, gy, quadrant in [
        (0, 0, 0),
        (0x7FFF, 0x7FFF, 0),
        (0x8000, 0, 1),
        (0, 0x8000, 2),
        (0x8000, 0x8000, 3),
        (0xFFFF, 0xFFFF, 3),
    ]:
        assert _py_morton(gx, gy) >> 30 == quadrant


def test_zvalue_column_grid_scaling(spark):
    # 4 corner points: min/max of each dim land on 0 / GRID_MAX
    df = spark.createDataFrame(
        [(10, 100), (10, 500), (90, 100), (90, 500)], "x long, y long"
    )
    rows = {
        (r["x"], r["y"]): (r["__gx"], r["__gy"])
        for r in zvalue_column(df, "x", "y").collect()
    }
    assert rows[(10, 100)] == (0, 0)
    assert rows[(90, 500)] == (GRID_MAX, GRID_MAX)
    assert rows[(10, 500)] == (0, GRID_MAX)


def test_zvalue_column_constant_dim_is_zero(spark):
    df = spark.createDataFrame([(5, 7), (5, 9)], "x long, y long")
    got = zvalue_column(df, "x", "y").select("__gx").distinct().collect()
    assert [r["__gx"] for r in got] == [0]


GRID = 64  # synthetic table: uniform 64×64 grid, one row per cell
N_FILES = 8


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """The same 4096-point grid written z-clustered and x-clustered."""
    base = tmp_path_factory.mktemp("zorder")
    pts = spark.range(GRID * GRID).select(
        (F.col("id") % GRID).alias("x"), (F.col("id") / GRID).cast("long").alias("y")
    )
    zpath = str(base / "z")
    xpath = str(base / "x")
    write_zordered(pts, "x", "y", zpath, n_files=N_FILES)
    pts.repartitionByRange(N_FILES, "x").write.mode("overwrite").parquet(xpath)
    return zpath, xpath


def test_write_zordered_drops_helpers_and_keeps_rows(spark, layouts):
    zpath, _ = layouts
    df = spark.read.parquet(zpath)
    assert sorted(df.columns) == ["x", "y"]
    assert df.count() == GRID * GRID


def test_box_prune_beats_linear_layout(spark, layouts):
    zpath, xpath = layouts
    zman = build_manifest(spark, zpath, ["x", "y"])
    xman = build_manifest(spark, xpath, ["x", "y"])
    # y-band box: a linear x-layout cannot prune at all (every file
    # spans the full y range); the z layout must skip files
    z_hit = prune_files_box(zman, "x", 0, GRID - 1, "y", 0, GRID // 4 - 1)
    x_hit = prune_files_box(xman, "x", 0, GRID - 1, "y", 0, GRID // 4 - 1)
    assert len(x_hit) == N_FILES
    assert len(z_hit) < N_FILES
    # 2-D box: z must prune at least as hard as linear
    z2 = prune_files_box(zman, "x", 0, GRID // 4 - 1, "y", 0, GRID // 4 - 1)
    x2 = prune_files_box(xman, "x", 0, GRID // 4 - 1, "y", 0, GRID // 4 - 1)
    assert len(z2) <= len(x2)
    assert len(z2) < N_FILES


def test_read_box_row_identical_to_full_scan(spark, layouts):
    zpath, _ = layouts
    man = build_manifest(spark, zpath, ["x", "y"])
    got = read_box(spark, man, "x", 5, 20, "y", 40, 50)
    full = (
        spark.read.parquet(zpath)
        .filter(F.col("x").between(5, 20) & F.col("y").between(40, 50))
    )
    assert sorted((r.x, r.y) for r in got.collect()) == sorted(
        (r.x, r.y) for r in full.collect()
    )


def test_read_box_empty_survivor_set(spark, layouts):
    zpath, _ = layouts
    man = build_manifest(spark, zpath, ["x", "y"])
    got = read_box(spark, man, "x", GRID + 10, GRID + 20, "y", 0, 5)
    assert got.count() == 0
    assert sorted(got.columns) == ["x", "y"]
