"""Gold layer: the reference's analytical view, composed over the
engine's own silver tables.

``upcoming_games_with_odds`` is the reference's single view and its
most load-bearing artifact (/root/reference/database_schema.sql:
144-169): scheduled future fixtures ⋈ teams (home role) ⋈ teams (away
role) ⋈ leagues, left-joined to the latest h2h odds snapshot per
fixture (``ROW_NUMBER() OVER (PARTITION BY fixture_id ORDER BY
collected_at DESC) = 1``).

Scale notes: both team roles and the leagues dim are explicit
broadcasts (dims are tiny — the reference's whole teams table is
20-60 rows/day, SURVEY.md §6; even at 100 TB of odds the dims stay
MB-scale). The only shuffles are the latest-per-fixture window and
the fixture⋈odds equi-join, both keyed on high-cardinality
fixture_id, so they spread evenly and AQE can coalesce. No global
sort: the view's ``ORDER BY kickoff_utc`` is presentation-layer and
is left to the consumer (a LIMIT-ed TakeOrderedAndProject if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import latest_per_key


def upcoming_games_with_odds(
    fixtures: DataFrame,
    teams: DataFrame,
    leagues: DataFrame,
    odds_history: DataFrame,
    now: Column,
) -> DataFrame:
    """The reference view (/root/reference/database_schema.sql:144-169)
    as one DataFrame composition.

    Divergences, both deliberate:
    - leagues joins on (league_id, season) — the reference joins on
      ``l.id`` alone, which is only sound because its SQLite PK can
      hold a single season per league; the dim here is keyed
      (id, season) per the DDL's ``UNIQUE(id, season)``.
    - the latest-odds window breaks collected_at ties on bookmaker
      (descending) — the reference's ``rn = 1`` pick is
      nondeterministic when two bookmakers share a snapshot instant.
    """
    h2h = odds_history.filter(F.col("market_type") == "h2h").select(
        "fixture_id", "home_odds", "draw_odds", "away_odds", "bookmaker", "collected_at"
    )
    latest = latest_per_key(h2h, ["fixture_id"], "collected_at", "bookmaker").select(
        F.col("fixture_id").alias("__odds_fixture_id"),
        "home_odds",
        "draw_odds",
        "away_odds",
        "bookmaker",
        F.col("collected_at").alias("odds_updated"),
    )
    ht = teams.select(F.col("id").alias("__ht_id"), F.col("name").alias("home_team"))
    at = teams.select(F.col("id").alias("__at_id"), F.col("name").alias("away_team"))
    lg = leagues.select(
        F.col("id").alias("__lg_id"),
        F.col("season").alias("__lg_season"),
        F.col("name").alias("league"),
        "country",
    )
    upcoming = fixtures.filter((F.col("kickoff_utc") > now) & (F.col("status") == "scheduled"))
    return (
        upcoming.join(F.broadcast(ht), upcoming.home_team_id == ht.__ht_id)
        .join(F.broadcast(at), upcoming.away_team_id == at.__at_id)
        .join(
            F.broadcast(lg),
            (upcoming.league_id == lg.__lg_id) & (upcoming.season == lg.__lg_season),
        )
        .join(latest, upcoming.id == latest.__odds_fixture_id, "left")
        .select(
            upcoming.id.alias("fixture_id"),
            "kickoff_utc",
            "home_team",
            "away_team",
            "league",
            "country",
            "home_odds",
            "draw_odds",
            "away_odds",
            "bookmaker",
            "odds_updated",
        )
    )
