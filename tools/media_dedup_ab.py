#!/usr/bin/env python
"""Same-session repeat probe for q_video_frame_dedup and
q_audio_near_dup (VERDICT r10 item 2).

BENCH_r10 printed q_video_frame_dedup 3.84 -> 11.12 s (2.90x) and
q_audio_near_dup 1.60 -> 3.90 s (2.44x) vs r9 while BOTH modules
(video.py/multimodal.py, audio.py/audiodedup.py) are byte-untouched
in r10 (`git diff 1fa2b1e..HEAD`) and both spreads EXCEED their
medians — the same signature the r9 q_video_stats drift had, which
BENCH_AB_r10 attributed to host contention. Same discriminating
experiment: interleave the two suspects with q_video_stats (the
control already confirmed clean by BENCH_AB_r10, byte-untouched
again) N times in ONE session at sf0.1 and compare medians against
the r9/r10 bench prints. Timing uses noop writes, matching bench.py
(count() would prune computed columns and measure a different plan).

Writes BENCH_AB_r11.json next to the other bench artifacts.
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
NAMES = ("q_video_frame_dedup", "q_audio_near_dup", "q_video_stats")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_AB_r11.json",
)


def main() -> None:
    spark = get_spark(app_name="fdps-media-dedup-ab")

    def run_one(name: str) -> float:
        t0 = time.monotonic()
        QUERIES[name].fn(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.monotonic() - t0, 3)

    times: dict[str, list[float]] = {n: [] for n in NAMES}
    for name in NAMES:  # one untimed warmup each
        run_one(name)
    for _ in range(ROUNDS):
        for name in NAMES:  # interleaved: A B C A B C ...
            times[name].append(run_one(name))
    report = {
        "purpose": (
            "VERDICT r10 item 2: are the r10 q_video_frame_dedup "
            "3.84->11.12 s and q_audio_near_dup 1.60->3.90 s prints "
            "code or host noise? (both modules byte-untouched in r10, "
            "both spreads >= medians)"
        ),
        "method": (
            f"same session, sf0.1, 1 warmup + {ROUNDS} interleaved "
            "noop-write timed runs each of the two suspects and "
            "q_video_stats (control confirmed clean by BENCH_AB_r10)"
        ),
        "bench_r09": {"q_video_frame_dedup": 3.84, "q_audio_near_dup": 1.60},
        "bench_r10": {"q_video_frame_dedup": 11.12, "q_audio_near_dup": 3.90},
        "runs": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "spread": {k: round(max(v) - min(v), 3) for k, v in times.items()},
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["median"]), json.dumps(report["spread"]))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
