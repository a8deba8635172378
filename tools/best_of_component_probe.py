#!/usr/bin/env python
"""Stage-cost breakdown of q_dedup_best_of_component (guide §1.4) —
the round's largest bench line. Times, through the noop sink:

  pairs      the full MinHash+LSH verified pair derivation
             (= q_dedup_minhash)
  cc         connected_components over those pairs (incl. the pair
             derivation feeding it — read the delta vs `pairs`)
  members    fingerprint projection + rep aggregate + comp joins
  quality    classify_quality corpus pass alone
  full       the registered query (adds the two windows)

Stages share q_dedup_minhash's internal grp cache exactly like the
real query does, so deltas attribute the incremental cost of each
stage in its natural (warm) context.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.operators.curation import best_of_component
from football_data_pipeline_spark.operators.dedup import (
    connected_components,
    fingerprint,
    q_dedup_minhash,
)
from football_data_pipeline_spark.operators.quality import classify_quality
from football_data_pipeline_spark.session import get_spark


def main() -> None:
    trials = 5
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="boc-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = load(spark, sf_dir, "documents")

    def pairs():
        return q_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")

    def cc():
        return connected_components(pairs())

    def members():
        fp = docs.select("doc_id", fingerprint(F.col("text")).alias("f"))
        rep = fp.groupBy("f").agg(F.min("doc_id").alias("rid"))
        comp = cc().select(F.col("doc_id").alias("rid"), "component")
        return fp.join(rep, "f").join(comp, "rid").select("doc_id", "component")

    def quality():
        return classify_quality(docs).select("doc_id", "score")

    def full():
        return best_of_component(docs, pairs())

    targets = {
        "pairs": pairs,
        "cc": cc,
        "members": members,
        "quality": quality,
        "full": full,
    }
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
                k: {
                    "median": round(statistics.median(s), 3),
                    "min": round(min(s), 3),
                    "spread": round(max(s) - min(s), 3),
                }
                for k, s in samples.items()
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
