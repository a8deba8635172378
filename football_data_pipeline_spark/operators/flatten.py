"""Nested-document flattening — the ETL core (SURVEY.md §2.2).

The reference fans one nested collection document out to 8 relational
tables with row-at-a-time Python loops
(/root/reference/database_integration.py:75-332). Here each target
table is one declarative DataFrame transform over the bronze scan:

- N1/N2 ``flatten_odds``: bookmakers[] → markets[] explode, then a
  name-keyed extraction of outcomes (no third explode — outcomes are
  probed with ``F.filter`` + ``element_at`` inside the row, which
  keeps the fan-out at B×M rows and the plan at two generators);
- N3 ``extract_team_statistics``: deep struct extraction with
  defaults + the win_percentage KPI;
- N4 ``flatten_head_to_head``: response[] explode;
- N5 ``flatten_lineups``: startXI/substitutes explode with the
  is_starter 1/0 flag, plus the derived ``players`` dim.

Quirk preserved (N2): a market whose key is none of
h2h/spreads/totals (e.g. ``h2h_lay``, present in live data) still
yields a row with all-NULL odds — the reference inserts
unconditionally (/root/reference/database_integration.py:219-226).

Scale notes: everything is per-document struct surgery — zero
shuffles, fully pipelined inside whole-stage codegen. At 100 TB this
stage is embarrassingly parallel; the only care needed is output
partitioning (partition silver odds by ``to_date(collected_at)``,
SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stable import rnd
from ..sources.ingest import ODDS_PHASES


def _outcome_field(outcomes: Column, name: Column | str, field: str) -> Column:
    """First outcome with the given name → its price/point, else NULL.

    Replaces the reference's dict lookup ``{o['name']: o['price']}``
    (/root/reference/database_integration.py:192) — last-wins dict vs
    first-wins here is observable only with duplicate outcome names,
    which the Odds API never produces.
    """
    name_col = F.lit(name) if isinstance(name, str) else name
    return F.element_at(F.filter(outcomes, lambda o: o["name"] == name_col), 1)[field]


def flatten_odds(bronze: DataFrame) -> DataFrame:
    """N1+N2: one odds_history row per (document, phase, bookmaker,
    market), with market-type-dependent column extraction.

    Source loop: /root/reference/database_integration.py:185-226.
    """
    # P10: the dynamic data.odds_<phase> keys, stacked then pruned
    phase_structs = F.array(
        *[
            F.struct(
                F.lit(p).alias("phase_key"),
                F.col(f"data.odds_{p}").alias("payload"),
            )
            for p in ODDS_PHASES
        ]
    )
    exploded = (
        bronze.select(
            "fixture_id",
            "collection_type",
            "collected_at_ts",
            F.explode(phase_structs).alias("ph"),
        )
        .select(
            "fixture_id",
            "collection_type",
            "collected_at_ts",
            F.col("ph.payload").alias("odds"),
        )
        # reference: skip when payload missing or has no bookmakers
        # (database_integration.py:179-181)
        .filter(F.col("odds").isNotNull() & F.col("odds.bookmakers").isNotNull())
        .select(
            "*",
            F.explode("odds.bookmakers").alias("bm"),
        )
        .select(
            "*",
            F.explode("bm.markets").alias("mkt"),
        )
    )
    outcomes = F.col("mkt.outcomes")
    market = F.col("mkt.key")
    home_name = F.col("odds.home_team")
    away_name = F.col("odds.away_team")
    is_h2h = market == "h2h"
    is_spreads = market == "spreads"
    is_totals = market == "totals"
    return exploded.select(
        F.col("fixture_id"),
        F.col("bm.title").alias("bookmaker"),
        market.alias("market_type"),
        F.when(is_h2h | is_spreads, _outcome_field(outcomes, home_name, "price")).alias("home_odds"),
        F.when(is_h2h, _outcome_field(outcomes, "Draw", "price")).alias("draw_odds"),
        F.when(is_h2h | is_spreads, _outcome_field(outcomes, away_name, "price")).alias("away_odds"),
        F.when(is_totals, _outcome_field(outcomes, "Over", "price")).alias("over_odds"),
        F.when(is_totals, _outcome_field(outcomes, "Under", "price")).alias("under_odds"),
        F.when(is_spreads, _outcome_field(outcomes, home_name, "point")).alias("handicap"),
        F.when(is_totals, _outcome_field(outcomes, "Over", "point")).alias("total_points"),
        F.col("collected_at_ts").alias("collected_at"),
        F.col("collection_type").alias("collection_phase"),
    )


def derive_season(date_col: Column) -> Column:
    """F3: season = year if month >= 8 else year − 1
    (/root/reference/database_integration.py:138,158,234) — derived
    from the document's collection time, not wall clock, so batch
    replays are deterministic.
    """
    return F.when(F.month(date_col) >= 8, F.year(date_col)).otherwise(F.year(date_col) - 1)


def _stats_side(bronze: DataFrame, side: str) -> DataFrame:
    env = F.col(f"data.{side}_team_stats")
    stats = env["response"]
    fixtures = stats["fixtures"]
    goals = stats["goals"]
    played = F.coalesce(fixtures["played"]["total"], F.lit(0))
    wins = F.coalesce(fixtures["wins"]["total"], F.lit(0))
    return (
        bronze.filter(env.isNotNull() & stats.isNotNull())
        .select(
            F.col(f"game_info.{side}_team_id").alias("team_id"),
            F.col("game_info.league_id").alias("league_id"),
            derive_season(F.col("collected_at_ts")).alias("season"),
            F.date_format("collected_at_ts", "yyyy-MM-dd").alias("collection_date"),
            played.alias("matches_played"),
            wins.alias("wins"),
            F.coalesce(fixtures["draws"]["total"], F.lit(0)).alias("draws"),
            F.coalesce(fixtures["loses"]["total"], F.lit(0)).alias("losses"),
            F.coalesce(goals["for"]["total"]["total"], F.lit(0)).alias("goals_for"),
            F.coalesce(goals["against"]["total"]["total"], F.lit(0)).alias("goals_against"),
            rnd(wins / F.greatest(played, F.lit(1)) * 100).alias("win_percentage"),
            F.col("collected_at_ts").alias("created_at"),
        )
    )


def extract_team_statistics(bronze: DataFrame) -> DataFrame:
    """N3: home+away deep-struct extraction with coalesce defaults.

    Source: /root/reference/database_integration.py:228-253 — chained
    ``.get(..., {})`` with 0 defaults and the A10 KPI at write time.
    """
    return _stats_side(bronze, "home").unionByName(_stats_side(bronze, "away"))


def flatten_head_to_head(bronze: DataFrame) -> DataFrame:
    """N4: h2h ``response[]`` → one historical-match row each.

    Source: /root/reference/database_integration.py:261-280.
    """
    env = F.col("data.head_to_head")
    return (
        bronze.filter(env.isNotNull() & env["response"].isNotNull())
        .select(F.col("collected_at_ts"), F.explode("data.head_to_head.response").alias("m"))
        .select(
            F.col("m.teams.home.id").alias("home_team_id"),
            F.col("m.teams.away.id").alias("away_team_id"),
            F.col("m.fixture.id").alias("fixture_id"),
            F.col("m.goals.home").alias("home_score"),
            F.col("m.goals.away").alias("away_score"),
            F.to_date(F.to_timestamp(F.regexp_replace("m.fixture.date", "Z$", "+00:00"))).alias(
                "match_date"
            ),
            F.col("m.league.id").alias("league_id"),
            F.col("collected_at_ts").alias("created_at"),
        )
    )


def flatten_lineups(bronze: DataFrame) -> DataFrame:
    """N5: startXI + substitutes → lineup rows with is_starter 1/0.

    Source: /root/reference/database_integration.py:287-332. Starters
    carry is_captain from the payload; substitutes leave it NULL
    (the reference omits the column on the substitute INSERT).
    """
    env = F.col("data.lineups")
    team_lineups = (
        bronze.filter(env.isNotNull() & env["response"].isNotNull())
        .select(
            "fixture_id",
            "collected_at_ts",
            F.explode("data.lineups.response").alias("lu"),
        )
    )

    def side(array_col: str, is_starter: bool) -> DataFrame:
        rows = team_lineups.select(
            "fixture_id",
            "collected_at_ts",
            F.col("lu.team.id").alias("team_id"),
            F.coalesce(F.col("lu.formation"), F.lit("Unknown")).alias("formation"),
            F.explode(F.col(f"lu.{array_col}")).alias("p"),
        )
        captain = (
            F.coalesce(F.col("p.player.captain"), F.lit(False))
            if is_starter
            else F.lit(None).cast("boolean")
        )
        return rows.select(
            "fixture_id",
            "team_id",
            "formation",
            F.col("p.player.id").alias("player_id"),
            F.coalesce(F.col("p.player.pos"), F.lit("Unknown")).alias("position"),
            F.lit(is_starter).alias("is_starter"),
            captain.alias("is_captain"),
            F.col("collected_at_ts").alias("collected_at"),
            F.col("p.player.name").alias("player_name"),
        )

    return side("startXI", True).unionByName(side("substitutes", False))


def extract_teams(bronze: DataFrame) -> DataFrame:
    """Teams dim from ``game_info`` — the FIRST table of the 8-table
    fan-out (/root/reference/database_integration.py:121-132:
    ``INSERT OR REPLACE INTO teams (id, name, country, updated_at)``
    for the home side then the away side of every document).

    U1 replace semantics in batch = latest-document-wins per team id.
    ``updated_at`` is the document's collection time rather than the
    reference's wall-clock ``datetime.now()`` so replays are
    deterministic; the tie-break on the originating fixture_id makes
    the winner total-ordered even when two documents share a
    collection instant.
    """
    from .upsert import keep_latest

    def side(s: str) -> DataFrame:
        return bronze.select(
            F.col(f"game_info.{s}_team_id").alias("id"),
            F.col(f"game_info.{s}_team").alias("name"),
            F.coalesce(F.col("game_info.country"), F.lit("Unknown")).alias("country"),
            F.col("collected_at_ts").alias("updated_at"),
            F.col("fixture_id").alias("__doc"),
        ).filter(F.col("id").isNotNull())

    both = side("home").unionByName(side("away"))
    return keep_latest(both, ["id"], ["updated_at", "__doc"]).drop("__doc")


def extract_leagues(bronze: DataFrame) -> DataFrame:
    """Leagues dim from ``game_info`` — U3 check-then-insert keyed by
    (id, season) (/root/reference/database_integration.py:134-152):
    the first document to mention a league in a season wins; later
    documents never overwrite.

    Season derives from the document's collection time (F3), not wall
    clock. The dim is keyed (id, season) as the reference's
    ``UNIQUE(id, season)`` declares — its SQLite PK on ``id`` alone
    can physically hold only one season per league, a small-scale
    artifact not worth replicating.
    """
    from .upsert import keep_first

    rows = bronze.select(
        F.col("game_info.league_id").alias("id"),
        F.col("game_info.league").alias("name"),
        F.coalesce(F.col("game_info.country"), F.lit("Unknown")).alias("country"),
        derive_season(F.col("collected_at_ts")).alias("season"),
        F.col("collected_at_ts").alias("created_at"),
        F.col("fixture_id").alias("__doc"),
    ).filter(F.col("id").isNotNull())
    return keep_first(rows, ["id", "season"], ["created_at", "__doc"]).drop("__doc")


def extract_fixtures(bronze: DataFrame) -> DataFrame:
    """Fixtures dim from ``game_info`` — U3 check-then-insert keyed by
    fixture id (/root/reference/database_integration.py:154-174): the
    first collection document for a fixture creates it; later phases
    (team_news, final_data) leave the row untouched.

    kickoff_utc gets the same ISO-``Z`` fixup as the reference's
    ``fromisoformat(... .replace('Z', '+00:00'))``; venue defaults to
    'Unknown' and status to the DDL default 'scheduled'
    (/root/reference/database_schema.sql:27-43).
    """
    from .upsert import keep_first

    rows = bronze.select(
        F.col("fixture_id").alias("id"),
        F.col("game_info.league_id").alias("league_id"),
        derive_season(F.col("collected_at_ts")).alias("season"),
        F.col("game_info.home_team_id").alias("home_team_id"),
        F.col("game_info.away_team_id").alias("away_team_id"),
        F.to_timestamp(F.regexp_replace("game_info.kickoff_utc", "Z$", "+00:00")).alias(
            "kickoff_utc"
        ),
        F.coalesce(F.col("game_info.venue"), F.lit("Unknown")).alias("venue_name"),
        F.lit("scheduled").alias("status"),
        F.col("collected_at_ts").alias("created_at"),
        F.col("collection_type").alias("__ct"),
    ).filter(F.col("id").isNotNull())
    return keep_first(rows, ["id"], ["created_at", "__ct"]).drop("__ct")


def derive_players(lineups: DataFrame) -> DataFrame:
    """The players dim from lineup rows (INSERT OR IGNORE semantics →
    first occurrence wins; /root/reference/database_integration.py:
    293-302). Dedup is deterministic via the earliest collected_at.
    """
    from .upsert import keep_first

    return keep_first(
        lineups.select(
            F.col("player_id").alias("id"),
            F.col("player_name").alias("name"),
            "team_id",
            "position",
            F.col("collected_at").alias("created_at"),
        ),
        keys=["id"],
        order_cols=["created_at"],
    )
