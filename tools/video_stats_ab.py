#!/usr/bin/env python
"""Same-session repeat probe for q_video_stats (VERDICT r9 item 5).

BENCH_r09 showed q_video_stats 1.40 -> 1.97 s vs r8 while the module
changed — but `git diff 523b210 HEAD -- operators/video.py` is purely
ADDITIVE (video_quality_gate + the patterned-clip bridge; zero lines
of the stats path modified), so a code-level A/B has nothing to
compare. The discriminating experiment is the BENCH_AB_r07 question
("host noise or real?") answered with same-session repeats: run
q_video_stats (the suspect) interleaved with q_star_join (a
byte-untouched control that ALSO drifted +20% in r9) N times in one
session at sf0.1 and report medians + spread. If the within-session
median sits well below the r9 bench number and the spread covers the
r8->r9 delta, the drift was cross-session contention, not code.

Writes BENCH_AB_r10.json next to the other bench artifacts.
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
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_AB_r10.json",
)


def main() -> None:
    spark = get_spark(app_name="fdps-video-stats-ab")
    times: dict[str, list[float]] = {"q_video_stats": [], "q_star_join": []}
    # one untimed warmup each (JIT/codegen/file-listing caches)
    for name in times:
        QUERIES[name].fn(spark, SF_DIR).count()
    for _ in range(ROUNDS):
        for name in times:  # interleaved: A B A B ...
            t0 = time.monotonic()
            QUERIES[name].fn(spark, SF_DIR).count()
            times[name].append(round(time.monotonic() - t0, 3))
    report = {
        "purpose": (
            "VERDICT r9 item 5: is the r9 q_video_stats 1.40->1.97 s "
            "drift code or host noise? (module diff r8->HEAD is purely "
            "additive, stats path byte-identical)"
        ),
        "method": (
            f"same session, sf0.1, 1 warmup + {ROUNDS} interleaved timed "
            "runs each of q_video_stats (suspect) and q_star_join "
            "(byte-untouched control that drifted the same direction in r9)"
        ),
        "bench_r08": {"q_video_stats": 1.40, "q_star_join": 1.31},
        "bench_r09": {"q_video_stats": 1.97, "q_star_join": 1.58},
        "runs": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "spread": {
            k: round(max(v) - min(v), 3) for k, v in times.items()
        },
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["median"]), json.dumps(report["spread"]))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
