"""Golden ETL tests on reference-shaped collection documents
(FIXTURES.md §B fan-out expectations).
"""

from __future__ import annotations

import json

import pytest

from football_data_pipeline_spark.operators.flatten import (
    derive_players,
    extract_team_statistics,
    flatten_head_to_head,
    flatten_lineups,
    flatten_odds,
)
from football_data_pipeline_spark.sources.ingest import read_collections

DEMO_DOC = {
    # shape: /root/reference/demo_enhanced_pipeline.py:79-114
    "fixture_id": 999999,
    "collection_type": "demo_data",
    "collected_at": "2024-02-15T12:00:00+00:00",
    "game_info": {
        "fixture_id": 999999,
        "home_team": "Manchester United",
        "away_team": "Liverpool",
        "home_team_id": 33,
        "away_team_id": 40,
        "league": "Premier League",
        "league_id": 39,
        "kickoff_utc": "2024-02-15T15:30:00+00:00",
        "country": "England",
        "venue": "Old Trafford",
    },
    "data": {
        "odds_early": {
            "home_team": "Manchester Utd",
            "away_team": "Liverpool",
            "bookmakers": [
                {
                    "title": "Bet365",
                    "markets": [
                        {
                            "key": "h2h",
                            "outcomes": [
                                {"name": "Manchester Utd", "price": 2.1},
                                {"name": "Draw", "price": 3.4},
                                {"name": "Liverpool", "price": 3.2},
                            ],
                        }
                    ],
                }
            ],
        }
    },
}

MULTI_MARKET_DOC = {
    # shape: /root/reference/data/early_odds_1390826_20250818_190818.json
    # (bookmakers[].markets[].outcomes[], incl. the unknown h2h_lay key)
    "fixture_id": 1390826,
    "collection_type": "early_odds",
    "collected_at": "2025-08-18T19:08:18Z",
    "game_info": {
        "fixture_id": 1390826,
        "home_team": "Arsenal",
        "away_team": "Chelsea",
        "home_team_id": 42,
        "away_team_id": 49,
        "league": "Premier League",
        "league_id": 39,
        "kickoff_utc": "2025-08-20T19:00:00+00:00",
        "country": "England",
        "venue": "Emirates",
    },
    "data": {
        "odds_early": {
            "home_team": "Arsenal",
            "away_team": "Chelsea",
            "bookmakers": [
                {
                    "title": "Bookie A",
                    "markets": [
                        {
                            "key": "h2h",
                            "outcomes": [
                                {"name": "Arsenal", "price": 1.8},
                                {"name": "Draw", "price": 3.9},
                                {"name": "Chelsea", "price": 4.2},
                            ],
                        },
                        {
                            "key": "spreads",
                            "outcomes": [
                                {"name": "Arsenal", "price": 1.95, "point": -1.5},
                                {"name": "Chelsea", "price": 1.88, "point": 1.5},
                            ],
                        },
                        {
                            "key": "totals",
                            "outcomes": [
                                {"name": "Over", "price": 2.0, "point": 2.5},
                                {"name": "Under", "price": 1.85, "point": 2.5},
                            ],
                        },
                        {
                            "key": "h2h_lay",
                            "outcomes": [
                                {"name": "Arsenal", "price": 1.82},
                                {"name": "Chelsea", "price": 4.3},
                            ],
                        },
                    ],
                },
                {
                    "title": "Bookie B",
                    "markets": [
                        {
                            "key": "h2h",
                            "outcomes": [
                                {"name": "Arsenal", "price": 1.79},
                                {"name": "Draw", "price": 4.0},
                                {"name": "Chelsea", "price": 4.25},
                            ],
                        }
                    ],
                },
            ],
        },
        "lineups": {
            "response": [
                {
                    "team": {"id": 42, "name": "Arsenal"},
                    "formation": "4-3-3",
                    "startXI": [
                        {"player": {"id": 100 + i, "name": f"Starter {i}", "pos": "M", "captain": i == 0}}
                        for i in range(11)
                    ],
                    "substitutes": [
                        {"player": {"id": 200 + i, "name": f"Sub {i}", "pos": "D"}}
                        for i in range(5)
                    ],
                }
            ]
        },
        "home_team_stats": {
            "response": {
                "fixtures": {
                    "played": {"home": 2, "away": 1, "total": 3},
                    "wins": {"home": 1, "away": 1, "total": 2},
                    "draws": {"home": 1, "away": 0, "total": 1},
                    # "loses" missing entirely → default 0
                },
                "goals": {
                    "for": {"total": {"home": 4, "away": 2, "total": 6}},
                    # "against" missing → default 0
                },
            }
        },
        "head_to_head": {
            "response": [
                {
                    "fixture": {"id": 555, "date": "2024-04-23T19:00:00+00:00"},
                    "teams": {
                        "home": {"id": 42, "name": "Arsenal"},
                        "away": {"id": 49, "name": "Chelsea"},
                    },
                    "goals": {"home": 5, "away": 0},
                    "league": {"id": 39},
                },
                {
                    "fixture": {"id": 556, "date": "2023-10-21T12:30:00Z"},
                    "teams": {
                        "home": {"id": 49, "name": "Chelsea"},
                        "away": {"id": 42, "name": "Arsenal"},
                    },
                    "goals": {"home": 2, "away": 2},
                    "league": {"id": 39},
                },
            ]
        },
    },
}


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    for i, doc in enumerate([DEMO_DOC, MULTI_MARKET_DOC]):
        (d / f"doc{i}.json").write_text(json.dumps(doc))
    return read_collections(spark, str(d)).cache()


def test_demo_doc_single_h2h_row(bronze):
    """FIXTURES.md §B golden: demo doc → exactly 1 odds row (2.1, 3.4, 3.2)."""
    rows = flatten_odds(bronze.filter("fixture_id = 999999")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.home_odds, r.draw_odds, r.away_odds) == (2.1, 3.4, 3.2)
    assert r.bookmaker == "Bet365"
    assert r.market_type == "h2h"
    assert r.collection_phase == "demo_data"
    assert r.over_odds is None and r.handicap is None


def test_bookmaker_market_fanout_with_null_quirk(bronze):
    """B bookmakers × M markets → B×M rows; unknown market keys still
    produce an all-NULL odds row (N2 quirk,
    /root/reference/database_integration.py:219-226)."""
    df = flatten_odds(bronze.filter("fixture_id = 1390826"))
    rows = {(r.bookmaker, r.market_type): r for r in df.collect()}
    assert len(rows) == 5  # A: h2h+spreads+totals+h2h_lay, B: h2h

    lay = rows[("Bookie A", "h2h_lay")]
    assert all(
        getattr(lay, c) is None
        for c in ["home_odds", "draw_odds", "away_odds", "over_odds", "under_odds", "handicap", "total_points"]
    )

    spreads = rows[("Bookie A", "spreads")]
    assert (spreads.home_odds, spreads.away_odds, spreads.handicap) == (1.95, 1.88, -1.5)
    assert spreads.draw_odds is None and spreads.total_points is None

    totals = rows[("Bookie A", "totals")]
    assert (totals.over_odds, totals.under_odds, totals.total_points) == (2.0, 1.85, 2.5)

    h2h_b = rows[("Bookie B", "h2h")]
    assert (h2h_b.home_odds, h2h_b.draw_odds, h2h_b.away_odds) == (1.79, 4.0, 4.25)


def test_lineups_fanout_and_flags(bronze):
    """11 startXI + 5 subs → 16 rows with is_starter flags; captain
    only on starters."""
    df = flatten_lineups(bronze)
    rows = df.collect()
    assert len(rows) == 16
    starters = [r for r in rows if r.is_starter]
    subs = [r for r in rows if not r.is_starter]
    assert len(starters) == 11 and len(subs) == 5
    assert sum(1 for r in starters if r.is_captain) == 1
    assert all(r.is_captain is None for r in subs)
    assert all(r.formation == "4-3-3" for r in rows)

    players = derive_players(df)
    assert players.count() == 16
    assert set(players.columns) == {"id", "name", "team_id", "position", "created_at"}


def test_team_statistics_defaults_and_kpi(bronze):
    """N3: missing branches default to 0; win_percentage KPI matches
    round(wins/max(played,1)*100, 2)."""
    stats = {r.team_id: r for r in extract_team_statistics(bronze).collect()}
    assert 42 in stats  # home side present
    home = stats[42]
    assert (home.matches_played, home.wins, home.draws, home.losses) == (3, 2, 1, 0)
    assert (home.goals_for, home.goals_against) == (6, 0)
    assert home.win_percentage == 66.67
    assert home.season == 2025  # August collection → season 2025 (F3)
    assert home.collection_date == "2025-08-18"


def test_head_to_head_flatten(bronze):
    h2h = {r.fixture_id: r for r in flatten_head_to_head(bronze).collect()}
    assert len(h2h) == 2
    assert (h2h[555].home_score, h2h[555].away_score) == (5, 0)
    assert str(h2h[556].match_date) == "2023-10-21"  # Z-suffix parsed
    assert h2h[556].home_team_id == 49


def test_detect_lineup_changes_crafted(spark):
    """Crafted 3-fixture sequence: the dropped starter (and only the
    dropped starter) yields an event; captain drops are major; the
    team's first fixture and unchanged lineups yield nothing."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.events import detect_lineup_changes

    def lu(fx, team, pid, starter, captain, ts):
        return (fx, team, "4-4-2", pid, "M", starter, captain, ts, f"P-{pid}")

    lineups = spark.createDataFrame(
        [
            # fixture 1 (team 5): starters 1,2,3 (1 is captain); sub 9
            lu(1, 5, 1, True, True, "1995-05-01 12:00:00"),
            lu(1, 5, 2, True, False, "1995-05-01 12:00:00"),
            lu(1, 5, 3, True, False, "1995-05-01 12:00:00"),
            lu(1, 5, 9, False, None, "1995-05-01 12:00:00"),
            # fixture 1 re-collected in a later phase — duplicate
            # starter rows must NOT double-fire events downstream
            lu(1, 5, 1, True, True, "1995-05-01 13:30:00"),
            lu(1, 5, 2, True, False, "1995-05-01 13:30:00"),
            lu(1, 5, 3, True, False, "1995-05-01 13:30:00"),
            # fixture 2: captain 1 missing, 9 promoted → ONE major event for 1
            lu(2, 5, 2, True, False, "1995-05-08 12:00:00"),
            lu(2, 5, 3, True, False, "1995-05-08 12:00:00"),
            lu(2, 5, 9, True, False, "1995-05-08 12:00:00"),
            # fixture 3: 3 dropped → ONE minor event for 3
            lu(3, 5, 2, True, False, "1995-05-15 12:00:00"),
            lu(3, 5, 9, True, False, "1995-05-15 12:00:00"),
            lu(3, 5, 1, True, True, "1995-05-15 12:00:00"),
        ],
        "fixture_id long, team_id long, formation string, player_id long, "
        "position string, is_starter boolean, is_captain boolean, c string, "
        "player_name string",
    ).select("*", F.to_timestamp("c").alias("collected_at")).drop("c")
    fixtures = spark.createDataFrame(
        [(1, "1995-05-01 15:00:00"), (2, "1995-05-08 15:00:00"), (3, "1995-05-15 15:00:00")],
        "id long, k string",
    ).select("id", F.to_timestamp("k").alias("kickoff_utc"))

    all_events = detect_lineup_changes(lineups, fixtures).collect()
    events = {
        (r["player_id"], r["start_date"].isoformat()): r for r in all_events
    }
    # exactly one event per real absence even with re-collected
    # lineups (the double-collection rows above)
    assert len(all_events) == len(events) == 2
    assert set(events) == {(1, "1995-05-08"), (3, "1995-05-15")}
    assert events[(1, "1995-05-08")]["severity"] == "major"  # captain
    assert events[(3, "1995-05-15")]["severity"] == "minor"
    e = events[(1, "1995-05-08")]
    assert e["event_type"] == "lineup_change" and e["source"] == "lineup_analysis"
    assert "P-1" in e["event_description"] and e["end_date"] is None
