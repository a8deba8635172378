"""The main correctness gate: every registered query vs its DuckDB
oracle at sf0.001 — the same comparison the driver runs at sf0.01.
"""

from __future__ import annotations

import pytest

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    assert_matches_oracle(df, duck, q.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
