"""Exact-co-moment correlation: partition-count-independent (the
property F.corr lacks), correct against a hand-computed case, and
NULL-guarded at zero variance."""

from __future__ import annotations

import math

from football_data_pipeline_spark.operators.stats import exact_corr_stats


def test_exact_corr_known_case_and_partition_independence(spark):
    # y = 2x + noise-free -> corr 1.0, slope 2.0
    rows = [("g", x, 2 * x) for x in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    for d in (df, df.repartition(17), df.repartition(1)):
        r = exact_corr_stats(d, "g", "x", "y").collect()[0]
        assert r.corr == 1.0 and r.slope == 2.0 and r.n == 100


def test_exact_corr_matches_textbook_value(spark):
    xs = [1, 2, 3, 4, 5]
    ys = [2, 1, 4, 3, 6]
    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(
        (n * sum(a * a for a in xs) - sum(xs) ** 2)
        * (n * sum(b * b for b in ys) - sum(ys) ** 2)
    )
    expected_corr = math.floor((num / den) * 10000 + 0.5) / 10000
    df = spark.createDataFrame(
        [("g", a, b) for a, b in zip(xs, ys)], "g string, x long, y long"
    )
    r = exact_corr_stats(df, "g", "x", "y").collect()[0]
    assert r.corr == expected_corr


def test_zero_variance_yields_null_not_nan(spark):
    df = spark.createDataFrame(
        [("g", 5, y) for y in range(10)], "g string, x long, y long"
    )
    r = exact_corr_stats(df, "g", "x", "y").collect()[0]
    assert r.corr is None and r.slope is None
