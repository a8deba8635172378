#!/usr/bin/env python
"""Same-session repeat probe for q_cow_delete and q_merge_cow
(VERDICT r11 item 5).

BENCH_r11 printed q_cow_delete 0.44 -> 1.13 s (2.55x) and
q_merge_cow 1.03 -> 2.00 s (1.94x) vs r10. Unlike the r10/r11 media
suspects, their module DID change in r11 (snapshots.py: atomic CAS +
the store seam) — but both queries are PLAN AUDITS over documents
(cow_delete_audit / cow_merge_audit classify synthetic file ranges
in-plan; no commit, no mkdir, no store call ever executes at query
time), so the CAS/seam diff is not on their execution path, and both
r11 spreads (0.71 on 1.13; 1.13 on 2.00) are at or above the deltas
— the host-contention signature every prior A/B (r07/r10/r11)
resolved the same way. Discriminating experiment: interleave the two
suspects with q_star_join (the control BENCH_AB_r10 confirmed clean,
byte-untouched again in r11 and r12) N times in ONE session at sf0.1
and compare medians against the r10/r11 bench prints. Timing uses
noop writes, matching bench.py (count() would prune computed columns
and measure a different plan).

Writes BENCH_AB_r12.json next to the other bench artifacts.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 6
NAMES = ("q_cow_delete", "q_merge_cow", "q_star_join")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_AB_r12.json",
)


def main() -> None:
    spark = get_spark(app_name="fdps-lakehouse-ab")

    def run_one(name: str) -> float:
        t0 = time.monotonic()
        QUERIES[name].fn(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.monotonic() - t0, 3)

    for name in NAMES:  # one warmup pass (JIT/codegen), not recorded
        run_one(name)
    runs: dict[str, list[float]] = {n: [] for n in NAMES}
    for _ in range(ROUNDS):
        for name in NAMES:
            runs[name].append(run_one(name))

    out = {
        "purpose": (
            "VERDICT r11 item 5: are the r11 q_cow_delete 0.44->1.13 s "
            "and q_merge_cow 1.03->2.00 s prints code or host noise? "
            "(both are in-plan audits — the r11 snapshots.py CAS/seam "
            "diff never executes on their query path; both spreads >= "
            "deltas)"
        ),
        "method": (
            "same session, sf0.1, 1 warmup + 6 interleaved noop-write "
            "timed runs each of the two suspects and q_star_join "
            "(control confirmed clean by BENCH_AB_r10, byte-untouched)"
        ),
        "bench_r10": {"q_cow_delete": 0.44, "q_merge_cow": 1.03},
        "bench_r11": {"q_cow_delete": 1.13, "q_merge_cow": 2.00},
        "runs": runs,
        "medians": {n: round(statistics.median(v), 3) for n, v in runs.items()},
        "spreads": {
            n: round(max(v) - min(v), 3) for n, v in runs.items()
        },
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["medians"]))


if __name__ == "__main__":
    main()
