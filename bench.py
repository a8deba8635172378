#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_...": sec, ...}, "spread": {"q_...": sec, ...},
   "trials": N, "sf": <float>}

Each query is fully materialized through the no-op sink (format
"noop") so projection pruning can't skip work, and timing excludes
result transfer to the driver.

Noise control: every query runs N_TRIALS times (default 3, override
SPARK_GRAFT_BENCH_TRIALS), trials INTERLEAVED round-robin — trial
t+1 of a query is separated from trial t by a full pass over the
other queries, so a transient background-load spike on the shared
box cannot hit all trials of one query. "queries" reports the
per-query MEDIAN, "spread" the max−min across trials; a
round-over-round delta smaller than the spread is noise, not a
regression. Trials share one JVM deliberately: the warm-up pass
already isolates JIT/codegen effects, and a fresh JVM per trial
would re-measure startup, not the plans.

Expected stderr: one benign ``WindowExec: No Partition Defined``
warning from q_fuzzy_join — resolution.rank_candidates's deliberate
global sort of the DIM-SIZED candidate universe (never the pair
stream); its input size is enforced by a plan-embedded guard
(resolution.py MAX_RANK_CANDIDATES).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES
from football_data_pipeline_spark.session import get_spark

#: representative cross-section: joins, windows, aggs, ER cascade,
#: dedup/LSH, ANN, text — the operators that dominate real workloads
HEADLINE = [
    "q_star_join",
    "q_latest_per_key",
    "q_upcoming_games",
    "q_lag_movement",
    "q_group_multi",
    "q_topk_group",
    "q_range_join",
    "q_upsert_latest",
    "q_asof_join",
    "q_fuzzy_join",
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_knn_bruteforce",
    "q_text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    n_trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))
    spark = get_spark(app_name="fdps-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    # JIT/codegen warm-up: one pass over the operator paths at the
    # smallest SF. Reads different parquet files than the measured
    # run, so no data is reused — only compiled code paths.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name in HEADLINE:
            QUERIES[name].fn(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_trials):
        for name in HEADLINE:
            fn = QUERIES[name].fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {n: round(max(s) - min(s), 3) for n, s in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "trials": n_trials,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
