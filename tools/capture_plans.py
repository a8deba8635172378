#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/<round>/.

Usage: python tools/capture_plans.py <tag-suffix> [query ...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag-suffix>.txt (round
dir defaults to r14) for every bench headline query (or just the
ones named). Driver-only planning — no jobs run except eager seams
(localCheckpoint) inside query constructors.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES
from football_data_pipeline_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    names = sys.argv[2:] or bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="fdps-plans")
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
