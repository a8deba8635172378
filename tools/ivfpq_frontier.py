#!/usr/bin/env python
"""Measure the IVF-PQ SERVING frontier (VERDICT r8 item 5): mean
recall@5 and wall seconds for NPROBE x SHORTLIST at the shipped
TRAIN_SAMPLE=448 bounded-training knob, on the exact production
pipeline (ivfpq.ivfpq_recall — the registered query is the
NPROBE=3/SHORTLIST=50 cell). Wall time is the FULL query (training +
exact-L2 audit baseline included, identical across cells), so read
the LATENCY column as relative cost of the serving knobs, and the
recall column as the number a 100 TB user buys with them.

Run: python tools/ivfpq_frontier.py [sf_dir]   (default sf0.01)
Results land in ivfpq.py's module docstring.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_data_pipeline_spark.operators import ivfpq
from football_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    trials = int(os.environ.get("FRONTIER_TRIALS", "3"))
    spark = get_spark(app_name="fdps-ivfpq-frontier")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up at the default cell so JIT/codegen is out of the medians
    ivfpq.ivfpq_recall(spark, sf_dir).write.mode("overwrite").format("noop").save()
    print(f"# sf_dir={sf_dir} TRAIN_SAMPLE={ivfpq.TRAIN_SAMPLE} trials={trials}")
    print("nprobe  shortlist  mean_recall@5  wall_s(median)")
    for nprobe in (3, 4, 5):
        for shortlist in (25, 50, 100):
            walls = []
            recall = None
            for _ in range(trials):
                t0 = time.perf_counter()
                rows = ivfpq.ivfpq_recall(
                    spark, sf_dir, nprobe=nprobe, shortlist=shortlist
                ).collect()
                walls.append(time.perf_counter() - t0)
                recall = sum(r.recall_at_k for r in rows) / len(rows)
            print(
                f"{nprobe:6d}  {shortlist:9d}  {recall:13.3f}  "
                f"{statistics.median(walls):8.2f}"
            )


if __name__ == "__main__":
    main()
