"""k-anonymity ladder: hand-computed profile on a crafted table and
the monotonicity guarantee (coarsening can only merge groups, so
rows-at-risk never increases with level)."""

from __future__ import annotations

from football_data_pipeline_spark.operators.privacy import (
    k_anonymity_profile,
)

SCHEMA = "doc_id long, lang string, source string, n_chars long"


def test_hand_computed_profile(spark):
    rows = (
        # level-0 group of 5 (exactly k) -> NOT at risk
        [(i, "en", "a", 100) for i in range(5)]
        # two level-0 singletons that MERGE at level 1 (150//100 ==
        # 199//100 == 1) into a group of 2 -> still < k at level 1
        + [(10, "en", "a", 150), (11, "en", "a", 199)]
        # a singleton that only reaches k-anonymity at level 2
        + [(20, "fr", "b", 42)]
    )
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.level: r for r in k_anonymity_profile(df, k=5).collect()}
    # level 0: groups {100:5}, {150:1}, {199:1}, {42:1} -> 3 small
    assert out[0].n_groups == 4
    assert out[0].n_small_groups == 3 and out[0].rows_at_risk == 3
    # level 1: buckets {1:5}, {1(en,a,150/199):2}... bucket(100)=1,
    # bucket(150)=1, bucket(199)=1 -> en/a merges to ONE group of 7;
    # fr/b bucket(42)=0 stays a singleton
    assert out[1].n_groups == 2
    assert out[1].n_small_groups == 1 and out[1].rows_at_risk == 1
    # level 2: (en,a)=7, (fr,b)=1 -> the fr singleton remains exposed
    assert out[2].n_groups == 2 and out[2].rows_at_risk == 1
    # monotone: risk never increases as levels coarsen
    assert out[0].rows_at_risk >= out[1].rows_at_risk >= out[2].rows_at_risk


def test_monotone_on_random_shape(spark):
    rows = [
        (i, ["en", "de"][i % 2], ["a", "b", "c"][i % 3], 40 + (i * 7) % 300)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.level: r for r in k_anonymity_profile(df).collect()}
    assert out[0].rows_at_risk >= out[1].rows_at_risk >= out[2].rows_at_risk
    assert out[2].n_groups <= out[1].n_groups <= out[0].n_groups
