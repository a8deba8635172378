#!/usr/bin/env python
"""A/B the checkpointed pagerank against a co-partitioned-edges
variant (guide §2.4: two operations keyed the same way share one
exchange; localCheckpoint preserves outputPartitioning/outputOrdering
through LogicalRDD, so a src-partitioned, src-sorted edge checkpoint
makes every round's edge⋈score join exchange-free AND sort-free on
the edge side — the per-round shuffles left are the node-sized score
vector and the post-join dst aggregate).

Also asserts the two variants' outputs are byte-identical (the
decimal-grid rounding discipline makes scores partitioning-
independent, so this must hold exactly).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.functions.stable import rnd
from football_data_pipeline_spark.operators.graphrank import (
    CUST_BASE,
    DAMPING,
    GRID,
    ITERATIONS,
    OUT,
    TELEPORT_NUM,
)
from football_data_pipeline_spark.session import get_spark


def build_graph(spark, sf_dir):
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
    edges = trade.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionByName(trade.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    nodes = supplier.select(F.col("s_suppkey").alias("node")).unionByName(
        customer.select((F.lit(CUST_BASE) + F.col("c_custkey")).alias("node"))
    )
    return nodes, edges


def pagerank_copart(
    nodes: DataFrame, edges: DataFrame, iterations: int = ITERATIONS
) -> DataFrame:
    """graphrank.pagerank(checkpoint_every=1) with the edge table
    repartitioned by src and sorted within partitions BEFORE its
    one-time checkpoint."""
    spark = nodes.sparkSession
    num_parts = spark.sparkContext.defaultParallelism
    n_total = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    pr = nodes.select("node", rnd(F.lit(1.0 / n_total), GRID).alias("pr"))
    edges = (
        edges.repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .localCheckpoint()
    )
    outdeg = outdeg.localCheckpoint()
    pr = pr.localCheckpoint()
    teleport = TELEPORT_NUM / n_total
    for _ in range(iterations):
        scored = edges.join(
            pr.select(F.col("node").alias("src"), "pr"), "src"
        ).join(F.broadcast(outdeg), "src")
        contrib = scored.groupBy(F.col("dst").alias("node")).agg(
            F.sum(
                rnd(F.col("pr") / F.col("outdeg"), GRID).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("inflow")
        )
        dangling = pr.join(
            outdeg.select(F.col("src").alias("node")), "node", "left_anti"
        ).agg(
            F.coalesce(
                F.sum(F.col("pr").cast("decimal(38,12)")).cast("double"),
                F.lit(0.0),
            ).alias("d_mass")
        )
        pr = (
            pr.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                rnd(
                    F.lit(teleport)
                    + F.lit(DAMPING)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("d_mass") / n_total
                    ),
                    GRID,
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr.select("node", rnd(F.col("pr"), OUT).alias("pr"))


def main() -> None:
    trials = 5
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pagerank-copart-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from football_data_pipeline_spark.operators.graphrank import pagerank

    def current():
        nodes, edges = build_graph(spark, sf_dir)
        return pagerank(nodes, edges, checkpoint_every=1)

    def copart():
        nodes, edges = build_graph(spark, sf_dir)
        return pagerank_copart(nodes, edges)

    # exact-equality gate first
    a, b = current(), copart()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    targets = {"current": current, "copart": copart}
    for fn in targets.values():
        fn().write.mode("overwrite").format("noop").save()
    samples = {k: [] for k in targets}
    for _ in range(trials):
        for name, fn in targets.items():
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "diff_rows": diff,
                **{
                    k: {
                        "median": round(statistics.median(s), 3),
                        "min": round(min(s), 3),
                        "spread": round(max(s) - min(s), 3),
                    }
                    for k, s in samples.items()
                },
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
