"""Bucketed co-located joins: the executed plan must contain no
Exchange when both sides are bucketed on the join key with the same
bucket count — the zero-shuffle property bucketing exists for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.sources.bucketing import read_table, write_bucketed

from .conftest import SF_DIR


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    lineitem = load(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, path=str(tmp_path / "b_orders")
    )
    write_bucketed(
        lineitem,
        "b_lineitem",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(tmp_path / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_lineitem = bucketed_pair
    o = read_table(spark, t_orders)
    l = read_table(spark, t_lineitem)
    # disable broadcast so the join strategy depends on the layout,
    # as it would with two 100 TB fact tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_rows_roundtrip(spark, bucketed_pair):
    t_orders, _ = bucketed_pair
    assert read_table(spark, t_orders).count() == load(spark, SF_DIR, "orders").count()
