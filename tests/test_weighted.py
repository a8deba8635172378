"""A-ES weighted sampling: the two-phase skew-proof plan must equal
the naive single window exactly, heavy weights must actually be
favored, and the draw must be partition-independent."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.weighted import (
    aes_key,
    weighted_topk,
)

SCHEMA = "id long, w long, g string"


def _pop(spark, n=400):
    # two strata; weights 1..n
    rows = [(i, 1 + i % 97, "a" if i % 2 else "b") for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def _naive(df, k):
    keyed = df.withColumn("__key", aes_key(F.col("id"), F.col("w")))
    w = Window.partitionBy("g").orderBy(F.desc("__key"), F.asc("id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__key")
    )


def test_two_phase_equals_single_window(spark):
    df = _pop(spark)
    for k in (1, 7, 40):
        a = sorted(map(tuple, weighted_topk(df, "id", "w", "g", k).collect()))
        b = sorted(map(tuple, _naive(df, k).collect()))
        assert a == b, k


def test_partition_independent(spark):
    df = _pop(spark)
    base = sorted(map(tuple, weighted_topk(df, "id", "w", "g", 10).collect()))
    for parts in (1, 13):
        again = sorted(
            map(tuple, weighted_topk(df.repartition(parts), "id", "w", "g", 10).collect())
        )
        assert again == base


def test_small_stratum_returns_all_rows(spark):
    df = spark.createDataFrame([(1, 5, "tiny"), (2, 9, "tiny")], SCHEMA)
    out = weighted_topk(df, "id", "w", "g", k=40).collect()
    assert sorted(r.id for r in out) == [1, 2]
    assert sorted(r.rank for r in out) == [1, 2]


def test_heavy_weights_are_favored(spark):
    # one stratum, half the ids weight 1000, half weight 1: across 20
    # independent salts the heavy half must dominate the k=20 sample
    rows = [(i, 1000 if i < 100 else 1, "g") for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    heavy_total = total = 0
    for s in range(20):
        out = weighted_topk(df, "id", "w", "g", k=20, salt=f"s{s}").collect()
        heavy_total += sum(1 for r in out if r.w == 1000)
        total += len(out)
    assert total == 400
    # expectation is ~99% heavy; even a loose bound separates it from
    # the unweighted 50%
    assert heavy_total / total > 0.8
