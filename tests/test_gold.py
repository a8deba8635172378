"""Gold read-path unit tests over crafted silver frames: the
parameterized !games horizon (VERDICT r4 item 6), the Performance
Trends series, and the league roster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.gold import (
    league_teams,
    team_stats_trend,
    upcoming_games_with_odds,
)

NOW = "1995-06-01 00:00:00"


def _silver(spark):
    now = F.lit(NOW).cast("timestamp")
    fixtures = spark.createDataFrame(
        # kickoffs at +6h, +30h, +80h past now; fixture 4 in the past
        [
            (1, 10, 11, 7, 1995, "1995-06-01 06:00:00", "scheduled"),
            (2, 11, 10, 7, 1995, "1995-06-02 06:00:00", "scheduled"),
            (3, 10, 11, 7, 1995, "1995-06-04 08:00:00", "scheduled"),
            (4, 11, 10, 7, 1995, "1995-05-01 15:00:00", "scheduled"),
        ],
        "id long, home_team_id long, away_team_id long, league_id long, "
        "season int, k string, status string",
    ).select("*", F.to_timestamp("k").alias("kickoff_utc")).drop("k")
    teams = spark.createDataFrame(
        [(10, "Arsenal"), (11, "Chelsea")], "id long, name string"
    )
    leagues = spark.createDataFrame(
        [(7, 1995, "Premier League", "England")],
        "id long, season int, name string, country string",
    )
    odds = spark.createDataFrame(
        [], "fixture_id long, market_type string, home_odds double, "
        "draw_odds double, away_odds double, bookmaker string, "
        "collected_at timestamp",
    )
    return fixtures, teams, leagues, odds, now


def test_games_horizon_parameterized(spark):
    """discord_integration.py:101 ``hours: int = 24``: the !games
    window excludes fixtures past now + hours; the bare view keeps
    every future fixture."""
    fixtures, teams, leagues, odds, now = _silver(spark)

    def ids(**kw):
        df = upcoming_games_with_odds(fixtures, teams, leagues, odds, now, **kw)
        return sorted(r.fixture_id for r in df.collect())

    assert ids() == [1, 2, 3]  # default: no horizon (the schema.sql view)
    assert ids(horizon_hours=24) == [1]  # the !games default window
    assert ids(horizon_hours=48) == [1, 2]  # non-default horizon
    assert ids(horizon_hours=96) == [1, 2, 3]


def test_team_stats_trend_series(spark):
    stats = spark.createDataFrame(
        [
            (10, 7, "2024-01-01", 50.0, 3, 1, 4, "2024-01-01 09:00:00"),
            (10, 7, "2024-01-08", 60.0, 5, 2, 5, "2024-01-08 09:00:00"),
            (11, 7, "2024-01-01", 10.0, 0, 9, 4, "2024-01-01 09:00:00"),
        ],
        "team_id long, league_id long, collection_date string, "
        "win_percentage double, goals_for int, goals_against int, "
        "matches_played int, c string",
    ).select("*", F.to_timestamp("c").alias("created_at")).drop("c")
    rows = team_stats_trend(stats, F.lit(10)).collect()
    assert [r.collection_date for r in rows] == ["2024-01-01", "2024-01-08"]
    assert [r.win_percentage for r in rows] == [50.0, 60.0]
    assert all(r.team_id == 10 for r in rows)


def test_league_teams_roster(spark):
    fixtures, teams, leagues, _, _ = _silver(spark)
    rows = league_teams(teams, leagues, fixtures).collect()
    got = {(r.team_id, r.n_games) for r in rows}
    # each team appears in all 4 fixtures (either role)
    assert got == {(10, 4), (11, 4)}
    assert all(r.league_name == "Premier League" for r in rows)
    # league filter pushes to the scan and restricts the roster
    assert league_teams(teams, leagues, fixtures, league_id=99).count() == 0
