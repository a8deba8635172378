#!/usr/bin/env python
"""Time individual registered queries through the noop sink.

Usage: python tools/time_queries.py q_a q_b ... [--trials N]
Same methodology as bench.py (noop sink, warm-up pass at sf0.001,
per-query interleaved trials, median + spread) but for an arbitrary
subset — the solo-isolation probe of guide §1.4.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES
from football_data_pipeline_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = 3
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fdps-time")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in args:
        QUERIES[name].fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    # one unmeasured pass at target sf (JIT warm, bench.py's noisy-query discipline)
    for name in args:
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    samples: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(trials):
        for name in args:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {
            "median": round(statistics.median(s), 3),
            "spread": round(max(s) - min(s), 3),
            "samples": [round(x, 3) for x in s],
        }
        for n, s in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
