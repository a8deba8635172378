"""Skew-mitigation operators: the salted plans must be row-identical
to their naive forms (a mitigation that changes results is a bug),
deterministic across partitionings, and actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.skew import (
    SALT_N,
    fact_salt,
    salted_distinct_count,
    salted_join,
)

FACT_SCHEMA = "fk long, payload long"
DIM_SCHEMA = "fk long, name string"


def _skewed_facts(spark, n_hot=500, n_cold=50):
    # key 1 owns 90%+ of the rows — the hot-key shape
    rows = [(1, i) for i in range(n_hot)] + [
        (2 + i % 5, 10_000 + i) for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, FACT_SCHEMA)


def test_salted_join_matches_plain_join(spark):
    facts = _skewed_facts(spark)
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], DIM_SCHEMA
    )
    plain = facts.join(dim, "fk")
    salted = salted_join(facts, dim, "fk", fact_salt(F.col("payload")))
    assert sorted(salted.columns) == sorted(plain.columns)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """Every salt cell of the hot key must be non-empty once the row
    count dwarfs SALT_N — the point of the exercise."""
    facts = _skewed_facts(spark, n_hot=2000, n_cold=0)
    cells = (
        facts.withColumn("__salt", fact_salt(F.col("payload")))
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(cells) == SALT_N
    assert min(c["count"] for c in cells) > 0
    # no cell re-concentrates the key: each holds < half the rows
    assert max(c["count"] for c in cells) < 1000


def test_salted_distinct_exact_and_partition_independent(spark):
    rows = [("a", v % 37) for v in range(1000)] + [
        ("b", v % 5) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    for d in (df, df.repartition(13), df.repartition(1)):
        out = {
            r.g: r.n_distinct
            for r in salted_distinct_count(d, "g", "v").collect()
        }
        assert out == {"a": 37, "b": 5}


def test_salted_join_duplicate_dim_keys_match_plain(spark):
    """A dim with duplicate keys (each fact row matches 2 dim rows)
    must still produce the plain join's multiset — each fact row
    meets every matching dim row exactly once per replica set."""
    facts = _skewed_facts(spark, n_hot=50, n_cold=20)
    dim = spark.createDataFrame(
        [(k, f"dim{k}{tag}") for k in range(1, 8) for tag in "ab"],
        DIM_SCHEMA,
    )
    plain = facts.join(dim, "fk")
    salted = salted_join(facts, dim, "fk", fact_salt(F.col("payload")))
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
