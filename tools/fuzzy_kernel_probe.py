#!/usr/bin/env python
"""Isolate the per-pair kernel costs of the resolution cascade's hard
tier (guide §1.4: noop-sink isolation).

Rebuilds exactly the hard-tier pair stream of q_fuzzy_join at the
target SF (names the equality + substring tiers leave unresolved,
joined to their blocked candidates, norms/word-sets hoisted), then
times expression variants over it:

  full       conf_6 (array Jaccard) + conf_7 (levenshtein ratio)
  lev_only   conf_7 alone
  jac_only   conf_6 alone
  jac_eq     degenerate conf_6 (set-equality test -> {0, 0.7}) + conf_7
  lev_bound  conf_7 via threshold-bounded levenshtein + conf_6

Each variant ends in the same resolve_agg-shaped groupBy so codegen
context matches the real query.
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
from football_data_pipeline_spark.functions.normalize import normalize_name
from football_data_pipeline_spark.functions.similarity import (
    jaccard_from_words,
    levenshtein_ratio,
    word_set,
)
from football_data_pipeline_spark.session import get_spark


def hard_pairs(spark, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    api = customer.select(
        F.col("c_name").alias("api_name"), F.col("c_nationkey").alias("nk")
    )
    k = F.col("c_custkey") % 4
    cand = customer.select(
        F.when(k == 0, F.col("c_name"))
        .when(k == 1, F.concat(F.col("c_name"), F.lit(" FC")))
        .when(k == 2, F.upper(F.col("c_name")))
        .otherwise(F.regexp_replace(F.col("c_name"), "Customer#", "Cust#"))
        .alias("odds_name"),
        F.col("c_nationkey").alias("nk"),
    )
    manual = customer.filter(F.col("c_custkey") % 12 == 3).select(
        F.col("c_name").alias("api_name"),
        F.regexp_replace(F.col("c_name"), "Customer#", "Cust#").alias(
            "manual_target"
        ),
    )
    num_parts = spark.sparkContext.defaultParallelism
    api_df = (
        api.withColumn("__api_norm", normalize_name(F.col("api_name")))
        .withColumn("__api_words", word_set(F.col("__api_norm")))
        .join(F.broadcast(manual), on="api_name", how="left")
        .repartition(num_parts, F.col("api_name"))
    )
    cand_df = cand.withColumn(
        "__cand_norm", normalize_name(F.col("odds_name"))
    ).withColumn("__cand_words", word_set(F.col("__cand_norm")))
    # equality-resolved names (tiers 1/2/4) drop out, mirroring tier A
    an, cn = F.col("__api_norm"), F.col("__cand_norm")
    pairs = api_df.join(F.broadcast(cand_df), on="nk")
    eq = (
        pairs.filter(
            (F.col("api_name") == F.col("odds_name"))
            | (F.col("odds_name") == F.col("manual_target"))
            | (an == cn)
        )
        .select("api_name")
        .distinct()
    )
    hard = pairs.join(F.broadcast(eq), "api_name", "left_anti")
    # materialize the pair stream inputs so kernel timing excludes
    # synthesis (localCheckpoint: node-sized at this SF)
    return hard.select(
        "api_name", "odds_name", "__api_norm", "__cand_norm",
        "__api_words", "__cand_words",
    ).localCheckpoint()


def variants(hard: DataFrame) -> dict[str, DataFrame]:
    an, cn = F.col("__api_norm"), F.col("__cand_norm")
    aw, cw = F.col("__api_words"), F.col("__cand_words")
    lev = levenshtein_ratio(an, cn)
    c7 = F.when(lev > 0.4, lev * 0.6).otherwise(0.0)
    c6 = jaccard_from_words(aw, cw)
    sets_eq = (F.size(aw) == F.size(cw)) & (
        F.size(F.array_except(aw, cw)) == 0
    )
    c6_eq = F.when(sets_eq & (F.size(aw) > 0), F.lit(0.7)).otherwise(0.0)
    maxlen = F.greatest(F.length(an), F.length(cn))
    lev_b = F.levenshtein(an, cn, 15)
    lev_bound = F.when(
        (maxlen > 0) & (lev_b >= 0), 1.0 - lev_b / maxlen
    ).otherwise(0.0)
    c7_b = F.when(lev_bound > 0.4, lev_bound * 0.6).otherwise(0.0)

    def agg(c6x, c7x):
        return (
            hard.select("api_name", c6x.alias("c6"), c7x.alias("c7"))
            .groupBy("api_name")
            .agg(F.max("c6").alias("m6"), F.max("c7").alias("m7"))
        )

    return {
        "full": agg(c6, c7),
        "lev_only": agg(F.lit(0.0), c7),
        "jac_only": agg(c6, F.lit(0.0)),
        "jac_eq": agg(c6_eq, c7),
        "lev_bound": agg(c6, c7_b),
        "jac_eq_lev_bound": agg(c6_eq, c7_b),
        "none": agg(F.lit(0.0), F.lit(0.0)),
    }


def main() -> None:
    trials = 5
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fuzzy-kernel-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    hard = hard_pairs(spark, sf_dir)
    n = hard.count()
    vs = variants(hard)
    for name, df in vs.items():  # warm
        df.write.mode("overwrite").format("noop").save()
    samples: dict[str, list[float]] = {k: [] for k in vs}
    for _ in range(trials):
        for name, df in vs.items():
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "pairs": n,
        **{
            k: {
                "median": round(statistics.median(s), 3),
                "spread": round(max(s) - min(s), 3),
            }
            for k, s in samples.items()
        },
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
