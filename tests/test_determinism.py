"""Cross-parallelism determinism audit: a representative query slice
must produce value-identical results at different shuffle widths —
the engine's reproducibility contract (stable.py's decimal sums, the
exact-co-moment corr, deterministic salts, explicit tie-breaks) is
exactly the claim that the SAME job on a 5-reducer and a 32-reducer
cluster cannot disagree. A float-summing or rand-salting engine
fails this test; this one must not."""

from __future__ import annotations

import pytest

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES

from .conftest import SF_DIR, canonicalize

#: one query per determinism-risk family: float aggregation
#: (star_join / text_stats), closed-form float from exact sums
#: (corr_profile), hash salting (salted_distinct), sketch pruning
#: (heavy_hitters), window tie-breaks (latest_per_key), banded LSH
#: (dedup_minhash), integer-ratio rules (gopher_rules)
SLICE = [
    "q_star_join",
    "q_text_stats",
    "q_corr_profile",
    "q_salted_distinct",
    "q_heavy_hitters",
    "q_latest_per_key",
    "q_dedup_minhash",
    "q_gopher_rules",
]


@pytest.mark.parametrize("name", SLICE)
def test_same_result_at_5_and_32_shuffle_partitions(spark, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "5")
        narrow = canonicalize(QUERIES[name].fn(spark, SF_DIR).toPandas())
        spark.conf.set(key, "32")
        wide = canonicalize(QUERIES[name].fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set(key, before)
    assert narrow.equals(wide), f"{name} differs across shuffle widths"
