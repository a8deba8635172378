#!/usr/bin/env python
"""Probe checkpointed PageRank at PRODUCTION depth (VERDICT r8 item
7): 10x the sf0.1 trade graph's edges, 5/10/20 rounds with
checkpoint_every=5, proving per-round cost stays FLAT under
checkpointing (the bit-equality vs the unrolled form is already
pytest-locked; this measures the wall-clock claim). A lineage-
unrolled 20-round plan would grow per round; the checkpointed one
must show sec/round roughly constant across depths.

Run: python tools/pagerank_depth_probe.py   (~10 min)
Results land in graphrank.py's module docstring.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.operators.graphrank import CUST_BASE, pagerank
from football_data_pipeline_spark.session import get_spark

#: replica node-id stride — far past CUST_BASE + max customer id
REP_BASE = 10_000_000
N_REPS = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(os.environ.get("PROBE_TRIALS", "3"))
    spark = get_spark(app_name="fdps-pagerank-depth")
    spark.sparkContext.setLogLevel("ERROR")

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
    edges1 = trade.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionByName(trade.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    nodes1 = supplier.select(F.col("s_suppkey").alias("node")).unionByName(
        customer.select((F.lit(CUST_BASE) + F.col("c_custkey")).alias("node"))
    )
    reps = spark.range(N_REPS).select(F.col("id").alias("rep"))
    # 10 disjoint replicas: same structure, 10x the edge/node volume
    edges = (
        edges1.crossJoin(reps)
        .select(
            (F.col("src") + F.col("rep") * REP_BASE).alias("src"),
            (F.col("dst") + F.col("rep") * REP_BASE).alias("dst"),
        )
        .localCheckpoint()
    )
    nodes = (
        nodes1.crossJoin(reps)
        .select((F.col("node") + F.col("rep") * REP_BASE).alias("node"))
        .localCheckpoint()
    )
    print(
        f"# {sf_dir} x{N_REPS}: {edges.count()} edges, {nodes.count()} nodes, "
        f"checkpoint_every=5, trials={trials}"
    )
    # warm codegen once at shallow depth
    pagerank(nodes, edges, iterations=2, checkpoint_every=5).write.mode(
        "overwrite"
    ).format("noop").save()
    print("rounds  wall_s(median)  s_per_round")
    for iters in (5, 10, 20):
        walls = []
        for _ in range(trials):
            t0 = time.perf_counter()
            pagerank(
                nodes, edges, iterations=iters, checkpoint_every=5
            ).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls)
        print(f"{iters:6d}  {med:14.2f}  {med / iters:11.3f}")


if __name__ == "__main__":
    main()
