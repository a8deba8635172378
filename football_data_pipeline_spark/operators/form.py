"""Driver-checkable queries for the Discord read-path compositions
``!form`` and ``!trends`` (gold.team_form / gold.odds_trends).

Pattern (proven by dims.py): synthesize silver-shaped tables
deterministically from ``orders``, run the REAL composition, and
state the expected output directly in the oracle SQL.

``q_team_form`` synthesizes its silver directly at table level
(teams / fixtures-with-scores / team_statistics) because the
reference's bronze documents never carry final scores — its fixtures
get status/score from a separate result-update path
(/root/reference/database_schema.sql:27-43 columns), so the
composition over the silver contract is the unit under test.
``q_odds_trends`` lives in dims.py beside q_team_odds_lookup and
reuses the full bronze→silver lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import rnd
from ..registry import query
from .gold import team_form

_FORM_NOW = "1997-06-01 00:00:00"
_FORM_LIKE = "Team-14"


def _form_teams(orders: DataFrame) -> DataFrame:
    """Both fixture sides as a team dim: id = o_custkey (home) /
    o_custkey + 100000 (away), name = 'Team-<id>'."""
    def side(offset: int) -> DataFrame:
        tid = F.col("o_custkey") + offset
        return orders.select(
            tid.alias("id"),
            F.concat(F.lit("Team-"), tid.cast("string")).alias("name"),
        )

    return side(0).unionByName(side(100000)).distinct()


def _form_fixtures(orders: DataFrame) -> DataFrame:
    """Fixtures with result columns: every 5th order still scheduled
    (NULL scores), the rest finished with deterministic scores so
    W/D/L all occur."""
    key = F.col("o_orderkey")
    finished = key % 5 != 4
    return orders.select(
        key.alias("id"),
        F.col("o_custkey").alias("home_team_id"),
        (F.col("o_custkey") + 100000).alias("away_team_id"),
        F.col("o_orderdate").cast("timestamp").alias("kickoff_utc"),
        F.when(finished, F.lit("finished")).otherwise("scheduled").alias("status"),
        F.when(finished, key % 5).alias("home_score"),
        F.when(finished, key % 3).alias("away_score"),
    )


def _form_stats(orders: DataFrame) -> DataFrame:
    """One team_statistics snapshot per (home team, order date) — the
    GROUP BY makes the (team, collection_date) key unique, so the
    latest-snapshot ordering key is total."""
    g = orders.groupBy(
        F.col("o_custkey").alias("team_id"),
        F.col("o_orderdate").alias("__d"),
    ).agg(F.max("o_orderkey").alias("__k"))
    k = F.col("__k")
    played = k % 30 + 1
    wins = k % 10
    return g.select(
        "team_id",
        F.lit(1).alias("league_id"),
        F.date_format("__d", "yyyy-MM-dd").alias("collection_date"),
        played.alias("matches_played"),
        wins.alias("wins"),
        (k % 40).alias("goals_for"),
        (k % 35).alias("goals_against"),
        rnd(wins / F.greatest(played, F.lit(1)) * 100).alias("win_percentage"),
        F.col("__d").cast("timestamp").alias("created_at"),
    )


@query(
    "q_team_form",
    oracle=f"""
    WITH teams AS (
      SELECT DISTINCT o_custkey + side * 100000 AS id,
             'Team-' || CAST(o_custkey + side * 100000 AS VARCHAR) AS name
      FROM orders CROSS JOIN (VALUES (0), (1)) s(side)
    ),
    fixtures AS (
      SELECT o_orderkey AS id, o_custkey AS home_team_id,
             o_custkey + 100000 AS away_team_id,
             CAST(o_orderdate AS TIMESTAMP) AS kickoff_utc,
             CASE WHEN o_orderkey % 5 = 4 THEN 'scheduled' ELSE 'finished' END AS status,
             CASE WHEN o_orderkey % 5 <> 4 THEN o_orderkey % 5 END AS home_score,
             CASE WHEN o_orderkey % 5 <> 4 THEN o_orderkey % 3 END AS away_score
      FROM orders
    ),
    stats AS (
      SELECT o_custkey AS team_id,
             strftime(o_orderdate, '%Y-%m-%d') AS collection_date,
             CAST(o_orderdate AS TIMESTAMP) AS created_at,
             max(o_orderkey) % 30 + 1 AS matches_played,
             max(o_orderkey) % 10 AS wins,
             max(o_orderkey) % 40 AS goals_for,
             max(o_orderkey) % 35 AS goals_against
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    team AS (
      SELECT id, name AS team_name FROM teams
      WHERE name LIKE '%{_FORM_LIKE}%' ORDER BY id LIMIT 1
    ),
    snap AS (
      SELECT s.matches_played,
             floor(s.wins * 1.0 / greatest(s.matches_played, 1) * 100 * 100 + 0.5) / 100
               AS win_percentage,
             s.goals_for, s.goals_against
      FROM stats s JOIN team t ON s.team_id = t.id
      ORDER BY s.collection_date DESC, s.created_at DESC LIMIT 1
    ),
    recent AS (
      SELECT f.id AS fixture_id, f.kickoff_utc,
             CASE WHEN f.home_team_id = t.id THEN 'home' ELSE 'away' END AS venue,
             CASE WHEN f.home_team_id = t.id THEN f.away_team_id
                  ELSE f.home_team_id END AS opp_id,
             CASE WHEN f.home_team_id = t.id THEN f.home_score
                  ELSE f.away_score END AS team_score,
             CASE WHEN f.home_team_id = t.id THEN f.away_score
                  ELSE f.home_score END AS opp_score
      FROM fixtures f JOIN team t
        ON f.home_team_id = t.id OR f.away_team_id = t.id
      WHERE f.kickoff_utc <= TIMESTAMP '{_FORM_NOW}'
        AND f.status <> 'scheduled'
      ORDER BY f.kickoff_utc DESC, f.id DESC LIMIT 5
    ),
    recent_named AS (
      SELECT r.fixture_id, r.kickoff_utc, r.venue, o.name AS opponent,
             r.team_score, r.opp_score,
             CASE WHEN r.team_score > r.opp_score THEN 'W'
                  WHEN r.team_score = r.opp_score THEN 'D'
                  WHEN r.team_score < r.opp_score THEN 'L' END AS result
      FROM recent r JOIN teams o ON r.opp_id = o.id
    )
    SELECT t.id AS team_id, t.team_name,
           s.matches_played, s.win_percentage, s.goals_for, s.goals_against,
           r.fixture_id, r.kickoff_utc, r.venue, r.opponent,
           r.team_score, r.opp_score, r.result
    FROM team t
    LEFT JOIN snap s ON true
    LEFT JOIN recent_named r ON true
    """,
)
def q_team_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``!form`` read path end-to-end over synthesized silver:
    '%Team-14%' resolution (min-id LIMIT 1) → latest stats snapshot →
    last-5 completed fixtures before a replay now of 1997-06-01, with
    venue CASE, opponent name, and W/D/L result
    (/root/reference/discord_integration.py:232-301,
    database_integration.py:370-415).

    What the hash proves: the LIKE → min-id team cut, the
    latest-snapshot max_by with its total ordering key, the
    completed-fixture predicate + DESC top-5 with id tie-break, the
    home/away venue projection of scores, and the W/D/L derivation —
    and that the stats context replicates onto every fixture row
    (right-outer semantics).
    """
    orders = load(spark, sf_dir, "orders")
    now = F.lit(_FORM_NOW).cast("timestamp")
    return team_form(
        teams=_form_teams(orders),
        team_statistics=_form_stats(orders),
        fixtures=_form_fixtures(orders),
        team_like=_FORM_LIKE,
        now=now,
    )

_TREND_TEAM_ID = 1


@query(
    "q_team_stats_trend",
    oracle=f"""
    WITH stats AS (
      SELECT o_custkey AS team_id,
             strftime(o_orderdate, '%Y-%m-%d') AS collection_date,
             max(o_orderkey) % 30 + 1 AS matches_played,
             max(o_orderkey) % 10 AS wins,
             max(o_orderkey) % 40 AS goals_for,
             max(o_orderkey) % 35 AS goals_against
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT team_id, CAST(1 AS INTEGER) AS league_id, collection_date,
           floor(wins * 1.0 / greatest(matches_played, 1) * 100 * 100 + 0.5) / 100
             AS win_percentage,
           goals_for, goals_against, matches_played
    FROM stats WHERE team_id = {_TREND_TEAM_ID}
    """,
)
def q_team_stats_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Team Analysis "Performance Trends" series
    (/root/reference/streamlit_dashboard.py:444-497) over the same
    synthesized team_statistics silver as q_team_form: every snapshot
    for team 1 ordered over collection_date.

    What the hash proves: the point-query projection — per-snapshot
    win_percentage / goals / matches values survive untouched (no
    accidental re-aggregation), the team_id predicate keeps exactly
    one team's series, and one row per collection day arrives (the
    synth's (team, date) key is unique by construction).
    """
    orders = load(spark, sf_dir, "orders")
    from .gold import team_stats_trend

    return team_stats_trend(_form_stats(orders), F.lit(_TREND_TEAM_ID))
