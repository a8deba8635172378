#!/usr/bin/env python
"""Isolate q_upcoming_games component costs (guide §1.4).

Times, through the noop sink at the target SF:
  bronze        the two-phase document synthesis alone
  bronze1scan   same rows via ONE orders scan + explode(array(phase0,
                phase1)) instead of a union of two scans
  fixtures / teams / leagues / odds   each silver pipeline alone
  full          the registered q_upcoming_games
  full_1scan    q_upcoming_games over the one-scan bronze
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
from football_data_pipeline_spark.operators import dims
from football_data_pipeline_spark.operators.flatten import (
    extract_fixtures,
    extract_leagues,
    extract_teams,
    flatten_odds,
)
from football_data_pipeline_spark.operators.gold import upcoming_games_with_odds
from football_data_pipeline_spark.session import get_spark


def bronze_one_scan(orders):
    """_game_bronze rows from a single orders scan: the per-phase
    document structs are stacked in an array and exploded."""
    key = F.col("o_orderkey")
    cust = F.col("o_custkey")
    date_ts = F.col("o_orderdate").cast("timestamp")
    kickoff = F.concat(
        F.date_format(F.date_add("o_orderdate", 10), "yyyy-MM-dd"),
        F.lit("T15:00:00Z"),
    )
    home_id, away_id = cust, cust + 100000

    def nm(prefix, ident, phase):
        return F.concat(
            F.lit(prefix), ident.cast("string"), F.lit("@"),
            key.cast("string"), F.lit(f"/{phase}"),
        )

    def outcome(name, base, phase, bd, const):
        name_col = F.lit(name) if isinstance(name, str) else name
        return F.struct(
            name_col.alias("name"),
            ((base + phase * 7 + bd) / 100.0 + const).alias("price"),
            F.lit(None).cast("double").alias("point"),
        )

    docs = []
    for phase, ctype, slot in dims._PHASES:
        home_name, away_name = nm("T", home_id, phase), nm("T", away_id, phase)
        game_info = F.struct(
            home_id.alias("home_team_id"),
            away_id.alias("away_team_id"),
            home_name.alias("home_team"),
            away_name.alias("away_team"),
            (key % 20 + 1).alias("league_id"),
            nm("L", key % 20 + 1, phase).alias("league"),
            F.concat(F.lit("C-"), (key % 25).cast("string")).alias("country"),
            F.when(F.lit(phase == 1), F.lit("V1"))
            .otherwise(F.when(key % 3 != 0, F.lit("V0")))
            .alias("venue"),
            kickoff.alias("kickoff_utc"),
        )
        payload = F.struct(
            home_name.alias("home_team"),
            away_name.alias("away_team"),
            F.array(
                *[
                    F.struct(
                        F.lit(title).alias("title"),
                        F.array(
                            F.struct(
                                F.lit("h2h").alias("key"),
                                F.array(
                                    outcome(home_name, key % 250, phase, bd, 1.1),
                                    outcome("Draw", key % 170, phase, bd, 2.5),
                                    outcome(away_name, key % 310, phase, bd, 1.3),
                                ).alias("outcomes"),
                            )
                        ).alias("markets"),
                    )
                    for title, bd in dims._BOOKMAKERS
                ]
            ).alias("bookmakers"),
        )
        odds = F.when(key % 2 == 0, payload)
        null_odds = F.when(F.lit(False), payload)
        data = F.struct(
            (odds if slot == "early" else null_odds).alias("odds_early"),
            null_odds.alias("odds_pre_match"),
            null_odds.alias("odds_team_news"),
            (odds if slot == "final_data" else null_odds).alias("odds_final_data"),
        )
        docs.append(
            F.struct(
                key.alias("fixture_id"),
                F.lit(ctype).alias("collection_type"),
                (date_ts + F.expr(f"INTERVAL {phase} HOUR")).alias(
                    "collected_at_ts"
                ),
                game_info.alias("game_info"),
                data.alias("data"),
            )
        )
    return orders.select(
        F.explode(F.array(*docs)).alias("doc")
    ).select("doc.*")


def main() -> None:
    trials = 5
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="upcoming-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    orders = load(spark, sf_dir, "orders")
    now = F.lit("1995-06-01 00:00:00").cast("timestamp")

    def full(bfn):
        b = bfn(orders)
        return upcoming_games_with_odds(
            fixtures=extract_fixtures(b),
            teams=extract_teams(b),
            leagues=extract_leagues(b),
            odds_history=flatten_odds(b),
            now=now,
        )

    def full_narrow_ckpt():
        """game_info-only bronze checkpoint shared by the three dim
        extracts (the odds payload never materializes); flatten_odds
        keeps its own pruned scan."""
        b = dims._game_bronze(orders)
        narrow = b.select(
            "fixture_id", "collection_type", "collected_at_ts", "game_info"
        ).localCheckpoint()
        return upcoming_games_with_odds(
            fixtures=extract_fixtures(narrow),
            teams=extract_teams(narrow),
            leagues=extract_leagues(narrow),
            odds_history=flatten_odds(b),
            now=now,
        )

    targets = {
        "bronze": lambda: dims._game_bronze(orders),
        "bronze1scan": lambda: bronze_one_scan(orders),
        "fixtures": lambda: extract_fixtures(dims._game_bronze(orders)),
        "teams": lambda: extract_teams(dims._game_bronze(orders)),
        "leagues": lambda: extract_leagues(dims._game_bronze(orders)),
        "odds": lambda: flatten_odds(dims._game_bronze(orders)),
        "full": lambda: full(dims._game_bronze),
        "full_1scan": lambda: full(bronze_one_scan),
        "full_narrow_ckpt": full_narrow_ckpt,
    }
    for name, fn in targets.items():  # warm
        fn().write.mode("overwrite").format("noop").save()
    samples = {k: [] for k in targets}
    for _ in range(trials):
        for name, fn in targets.items():
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    # sanity: identical result sets
    a = dims._game_bronze(orders)
    b = bronze_one_scan(orders)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    out = {
        "one_scan_diff_rows": diff,
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
