#!/usr/bin/env python
"""Same-session A/B of q_pagerank's unrolled vs checkpointed form
(r13 optimization evidence). Interleaved trials through the noop
sink, medians printed."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.operators.graphrank import CUST_BASE, pagerank
from football_data_pipeline_spark.session import get_spark


def build(spark, sf_dir, ce):
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    trade = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.lit(CUST_BASE) + F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    edges = trade.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        trade.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    nodes = supplier.select(F.col("s_suppkey").alias("node")).unionByName(
        customer.select((F.lit(CUST_BASE) + F.col("c_custkey")).alias("node"))
    )
    return pagerank(nodes, edges, checkpoint_every=ce)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("AB_TRIALS", "4"))
    spark = get_spark(app_name="pagerank-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    variants = {"unrolled": None, "ce1": 1, "ce3": 3}
    # warm-up pass
    for ce in variants.values():
        build(spark, sf_dir, ce).write.mode("overwrite").format("noop").save()
    samples = {k: [] for k in variants}
    for _ in range(trials):
        for name, ce in variants.items():
            t0 = time.perf_counter()
            build(spark, sf_dir, ce).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                k: {
                    "median": round(statistics.median(s), 3),
                    "samples": [round(x, 3) for x in s],
                }
                for k, s in samples.items()
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
