"""ANALYZE column stats: exact values on a crafted table with
nulls, approx NDV within HLL error, native-type min/max (not
lexicographic). Exact mode is oracle-checked as q_analyze_stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.sources.analyze import (
    NDV_RSD,
    column_stats,
)


def test_exact_stats_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (10, "bbbb"), (None, "aa")],
        "k long, s string",
    )
    rows = {r.col: r for r in column_stats(df, ["k", "s"], exact=True).collect()}
    k = rows["k"]
    assert (k.n_rows, k.n_nonnull, k.ndv) == (4, 3, 3)
    # native-type min/max: 2 < 10 numerically even though '10' < '2'
    assert (k.min_val, k.max_val) == ("1", "10")
    assert k.avg_len == 1.33  # stable-rounded (1+1+2)/3
    s = rows["s"]
    assert (s.n_nonnull, s.ndv) == (3, 2)
    assert (s.min_val, s.max_val) == ("aa", "bbbb")
    assert abs(s.avg_len - round((2 + 2 + 4) / 3, 2)) < 1e-9


def test_approx_ndv_within_hll_error(spark):
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 137).alias("m")
    )
    rows = {r.col: r for r in column_stats(df, ["id", "m"]).collect()}
    assert abs(rows["id"].ndv - 20_000) <= 20_000 * 3 * NDV_RSD
    assert abs(rows["m"].ndv - 137) <= max(5, 137 * 3 * NDV_RSD)


def test_one_row_per_column_contract(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], "a long, b double, c string")
    out = column_stats(df, ["a", "b", "c"], exact=True)
    assert sorted(r.col for r in out.collect()) == ["a", "b", "c"]
    assert out.columns == [
        "col", "n_rows", "n_nonnull", "ndv", "min_val", "max_val", "avg_len",
    ]
