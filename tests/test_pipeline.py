"""T1 end-to-end: bronze JSON stream → foreachBatch → silver tables,
driven twice to check incremental upsert semantics across micro-
batches (replace for teams, insert-if-absent for leagues/fixtures,
append for facts).
"""

from __future__ import annotations

import copy
import json

from football_data_pipeline_spark.streaming.pipeline import start_pipeline

from .test_flatten import DEMO_DOC


def _write_doc(dirpath, name: str, doc: dict) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / name).write_text(json.dumps(doc))


def _run_drain(spark, src, silver, ckpt):
    q = start_pipeline(spark, str(src), str(silver), str(ckpt), trigger=None)
    q.awaitTermination(120)
    assert not q.isActive


def test_pipeline_fans_out_and_upserts(spark, tmp_path):
    src, silver, ckpt = tmp_path / "bronze", tmp_path / "silver", tmp_path / "ckpt"

    _write_doc(src, "doc1.json", DEMO_DOC)
    _run_drain(spark, src, silver, ckpt)

    teams = {r.id: r for r in spark.read.parquet(f"{silver}/teams").collect()}
    assert set(teams) == {33, 40}
    assert teams[33].name == "Manchester United"
    fixtures = spark.read.parquet(f"{silver}/fixtures").collect()
    assert [f.id for f in fixtures] == [999999]
    assert fixtures[0].venue_name == "Old Trafford"
    leagues = spark.read.parquet(f"{silver}/leagues").collect()
    assert [(lg.id, lg.name) for lg in leagues] == [(39, "Premier League")]
    odds = spark.read.parquet(f"{silver}/odds_history").collect()
    assert len(odds) == 1 and odds[0].bookmaker == "Bet365"
    assert odds[0].home_odds == 2.1

    # second micro-batch: same fixture re-collected later with a
    # renamed home team and different venue
    doc2 = copy.deepcopy(DEMO_DOC)
    doc2["collection_type"] = "final_data"
    doc2["collected_at"] = "2024-02-15T14:00:00+00:00"
    doc2["game_info"]["home_team"] = "Man Utd"
    doc2["game_info"]["venue"] = "Somewhere Else"
    _write_doc(src, "doc2.json", doc2)
    _run_drain(spark, src, silver, ckpt)

    teams = {r.id: r for r in spark.read.parquet(f"{silver}/teams").collect()}
    assert teams[33].name == "Man Utd"  # U1: latest document replaced
    fixtures = spark.read.parquet(f"{silver}/fixtures").collect()
    assert len(fixtures) == 1
    assert fixtures[0].venue_name == "Old Trafford"  # U3: first kept
    # append-only fact grew by the second snapshot
    odds = spark.read.parquet(f"{silver}/odds_history").collect()
    assert len(odds) == 2
    # checkpoint: draining again with no new files writes nothing
    _run_drain(spark, src, silver, ckpt)
    assert len(spark.read.parquet(f"{silver}/odds_history").collect()) == 2
