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


def team_odds_lookup(
    fixtures: DataFrame,
    teams: DataFrame,
    leagues: DataFrame,
    odds_history: DataFrame,
    team_like: str,
    now: Column,
    n_snapshots: int = 3,
) -> DataFrame:
    """The Discord ``!odds`` command read path
    (/root/reference/discord_integration.py:135-160), composed
    end-to-end: substring team resolution (P5) → the team's next
    upcoming fixture (earliest kickoff, LIMIT 1) → the latest
    ``n_snapshots`` h2h odds snapshots for it, each row carrying the
    full game context for embed rendering.

    Differences from the reference, both deliberate:
    - the reference's ``(ht.name LIKE ? OR at.name LIKE ?)`` OR-join
      is rewritten as a union of two broadcast semi joins (the J4
      rewrite) — the LIKE-matched team set is dim-sized, so each arm
      is a broadcast probe, never a BNLJ;
    - odds snapshots LEFT-join the chosen game (right-outer with the
      1-row game broadcast), so a game with no collected odds still
      returns its context row with NULL odds — the reference renders
      the same embed with zero odds fields;
    - both LIMIT cuts carry explicit tie-breaks (fixture id;
      bookmaker DESC) where the reference relies on scan order.

    Scale shape: teams/matched are broadcast; the only full-table
    work is one scan of fixtures (semi-join probe + kickoff filter →
    TakeOrderedAndProject top-1) and one scan of odds_history for the
    point lookup. On a real deployment the odds scan prunes via the
    bucketed/partitioned layout (sources/bucketing.py); at any scale
    nothing here shuffles more than the candidate set.
    """
    matched = teams.filter(F.col("name").like(f"%{team_like}%")).select(
        F.col("id").alias("__m_id")
    )
    home_hit = fixtures.join(
        F.broadcast(matched), fixtures.home_team_id == matched.__m_id, "left_semi"
    )
    away_hit = fixtures.join(
        F.broadcast(matched), fixtures.away_team_id == matched.__m_id, "left_semi"
    )
    ht = teams.select(F.col("id").alias("__ht_id"), F.col("name").alias("home_team"))
    at = teams.select(F.col("id").alias("__at_id"), F.col("name").alias("away_team"))
    lg = leagues.select(
        F.col("id").alias("__lg_id"),
        F.col("season").alias("__lg_season"),
        F.col("name").alias("league"),
    )
    next_game = (
        home_hit.unionByName(away_hit)
        .dropDuplicates(["id"])
        .filter(F.col("kickoff_utc") > now)
        .orderBy("kickoff_utc", "id")
        .limit(1)
        .join(F.broadcast(ht), F.col("home_team_id") == F.col("__ht_id"))
        .join(F.broadcast(at), F.col("away_team_id") == F.col("__at_id"))
        .join(
            F.broadcast(lg),
            (F.col("league_id") == F.col("__lg_id"))
            & (F.col("season") == F.col("__lg_season")),
        )
        .select(
            F.col("id").alias("__fx_id"),
            "kickoff_utc",
            "home_team",
            "away_team",
            "league",
        )
    )
    # two-step attach: an INNER broadcast join may build on either
    # side, so the 1-row game broadcasts against the odds scan; the
    # no-odds context row is then restored by a right-outer join
    # between two tiny relations (≤ n_snapshots rows vs 1 row). A
    # direct game-LEFT-JOIN-odds would force the BIG side to build
    # (left-outer broadcasts right only) and a right-outer with the
    # game as build side is unsupported — either way a full shuffle.
    h2h = odds_history.filter(F.col("market_type") == "h2h")
    odds_top = (
        h2h.join(
            F.broadcast(next_game.select("__fx_id")),
            h2h.fixture_id == F.col("__fx_id"),
        )
        .drop("__fx_id")
        .orderBy(F.desc("collected_at"), F.desc("bookmaker"))
        .limit(n_snapshots)
    )
    return (
        F.broadcast(odds_top)
        .join(next_game, odds_top.fixture_id == next_game.__fx_id, "right")
        .select(
            F.col("__fx_id").alias("fixture_id"),
            "kickoff_utc",
            "home_team",
            "away_team",
            "league",
            "bookmaker",
            "collection_phase",
            "market_type",
            "home_odds",
            "draw_odds",
            "away_odds",
            "collected_at",
        )
    )
