"""Driver-checkable queries for the bronze→dims fan-out and the gold
view — the entry tables of the reference's 8-table fan-out
(/root/reference/database_integration.py:121-174) and its one view
(/root/reference/database_schema.sql:144-169).

Pattern (proven by q_odds_flatten): synthesize bronze-shaped nested
documents deterministically from ``orders``, run the REAL flatteners/
view composition, and state the expected relational output directly
in the oracle. Each order yields TWO collection documents (an
``early_odds`` at collection instant T and a ``final_data`` at
T + 1 h) whose game_info *differs per phase* — so replace-vs-ignore
upsert semantics are observable, not vacuous:

- teams (U1 replace): the LATEST document's name/country must win;
- leagues + fixtures (U3 insert-if-absent): the FIRST document wins;
- the gold view's latest-odds window must pick the final snapshot,
  tie-breaking on bookmaker within it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .flatten import extract_fixtures, extract_leagues, extract_teams, flatten_odds
from .gold import odds_trends, team_odds_lookup, upcoming_games_with_odds
from .reports import validate_counts

#: (phase index, collection_type, data.odds_<key> slot) per document
_PHASES = ((0, "early_odds", "early"), (1, "final_data", "final_data"))

#: (bookmaker title, integer odds offset) — Beta exists so the
#: latest-odds window has a same-instant tie to break
_BOOKMAKERS = (("Alpha", 0), ("Beta", 3))


def _game_bronze(orders: DataFrame) -> DataFrame:
    """Two bronze collection documents per order.

    Identity mapping (mirrored literally in the oracle CTEs):
    fixture_id = o_orderkey; home/away team ids = o_custkey /
    o_custkey + 100000; league_id = o_orderkey % 20 + 1. Names embed
    the originating (fixture, phase) — ``T<id>@<fixture>/<phase>`` —
    so which document won an upsert is visible in the value hash.
    Odds payloads (h2h, 2 bookmakers) exist only for even orderkeys,
    so the gold view's LEFT join keeps odds-less fixtures.
    """
    key = F.col("o_orderkey")
    cust = F.col("o_custkey")
    date_ts = F.col("o_orderdate").cast("timestamp")
    kickoff = F.concat(
        F.date_format(F.date_add("o_orderdate", 10), "yyyy-MM-dd"), F.lit("T15:00:00Z")
    )
    home_id, away_id = cust, cust + 100000

    def nm(prefix: str, ident: Column, phase: int) -> Column:
        return F.concat(
            F.lit(prefix), ident.cast("string"), F.lit("@"), key.cast("string"), F.lit(f"/{phase}")
        )

    def outcome(name: Column | str, base: Column, phase: int, bd: int, const: float) -> Column:
        name_col = F.lit(name) if isinstance(name, str) else name
        return F.struct(
            name_col.alias("name"),
            ((base + phase * 7 + bd) / 100.0 + const).alias("price"),
            F.lit(None).cast("double").alias("point"),
        )

    docs = []
    for phase, ctype, slot in _PHASES:
        home_name, away_name = nm("T", home_id, phase), nm("T", away_id, phase)
        game_info = F.struct(
            home_id.alias("home_team_id"),
            away_id.alias("away_team_id"),
            home_name.alias("home_team"),
            away_name.alias("away_team"),
            (key % 20 + 1).alias("league_id"),
            nm("L", key % 20 + 1, phase).alias("league"),
            F.concat(F.lit("C-"), (key % 25).cast("string")).alias("country"),
            # phase-0 venue is NULL on every 3rd order (checks the
            # 'Unknown' default); phase-1 venue differs so a wrong
            # first-wins pick is visible
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
                    for title, bd in _BOOKMAKERS
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
            orders.select(
                key.alias("fixture_id"),
                F.lit(ctype).alias("collection_type"),
                (date_ts + F.expr(f"INTERVAL {phase} HOUR")).alias("collected_at_ts"),
                game_info.alias("game_info"),
                data.alias("data"),
            )
        )
    return docs[0].unionByName(docs[1])


# Shared oracle CTEs reconstructing the synthesized documents and the
# three dim upserts in plain SQL. Kept as one fragment so the four
# oracles cannot drift apart.
_DOC_CTES = """
    WITH docs AS (
      SELECT o_orderkey AS fid, o_custkey AS cust,
             (o_orderkey % 20) + 1 AS lid,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL (phase) HOUR AS cat,
             o_orderdate AS od, phase
      FROM orders CROSS JOIN (VALUES (0), (1)) p(phase)
    ),
    team_sides AS (
      SELECT cust + side * 100000 AS id,
             'T' || CAST(cust + side * 100000 AS VARCHAR) || '@'
                 || CAST(fid AS VARCHAR) || '/' || CAST(phase AS VARCHAR) AS name,
             'C-' || CAST(fid % 25 AS VARCHAR) AS country,
             cat AS updated_at, fid
      FROM docs CROSS JOIN (VALUES (0), (1)) s(side)
    ),
    teams_dim AS (
      SELECT id, name, country, updated_at FROM (
        SELECT *, row_number() OVER (PARTITION BY id
                                     ORDER BY updated_at DESC, fid DESC) AS rn
        FROM team_sides
      ) WHERE rn = 1
    ),
    league_rows AS (
      SELECT lid AS id,
             'L' || CAST(lid AS VARCHAR) || '@'
                 || CAST(fid AS VARCHAR) || '/' || CAST(phase AS VARCHAR) AS name,
             'C-' || CAST(fid % 25 AS VARCHAR) AS country,
             CASE WHEN month(cat) >= 8 THEN year(cat) ELSE year(cat) - 1 END AS season,
             cat AS created_at, fid
      FROM docs
    ),
    leagues_dim AS (
      SELECT id, name, country, season, created_at FROM (
        SELECT *, row_number() OVER (PARTITION BY id, season
                                     ORDER BY created_at, fid) AS rn
        FROM league_rows
      ) WHERE rn = 1
    ),
    fixtures_dim AS (
      SELECT fid AS id, lid AS league_id,
             CASE WHEN month(od) >= 8 THEN year(od) ELSE year(od) - 1 END AS season,
             cust AS home_team_id, cust + 100000 AS away_team_id,
             CAST(strftime(od + INTERVAL 10 DAY, '%Y-%m-%d') || ' 15:00:00' AS TIMESTAMP)
               AS kickoff_utc,
             CASE WHEN fid % 3 = 0 THEN 'Unknown' ELSE 'V0' END AS venue_name,
             'scheduled' AS status,
             CAST(od AS TIMESTAMP) AS created_at
      FROM docs WHERE phase = 0
    )
"""


@query(
    "q_teams_extract",
    oracle=_DOC_CTES + "SELECT id, name, country, updated_at FROM teams_dim",
)
def q_teams_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 dim fan-out: teams from game_info, latest document wins.

    Source semantics: ``INSERT OR REPLACE INTO teams`` per document
    side (/root/reference/database_integration.py:121-132). The two
    phases carry different names for the same team id, so a
    first-wins (or unordered) implementation hash-mismatches.
    """
    return extract_teams(_game_bronze(load(spark, sf_dir, "orders")))


@query(
    "q_leagues_extract",
    oracle=_DOC_CTES + "SELECT id, name, country, season, created_at FROM leagues_dim",
)
def q_leagues_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 dim fan-out: leagues keyed (id, season), first document wins
    (check-then-insert, /root/reference/database_integration.py:
    134-152). ~20 league ids × ~7 seasons of orderdates, many
    same-instant candidates → the (created_at, fixture_id) tie-break
    is load-bearing.
    """
    return extract_leagues(_game_bronze(load(spark, sf_dir, "orders")))


@query(
    "q_fixtures_extract",
    oracle=_DOC_CTES
    + """
    SELECT id, league_id, season, home_team_id, away_team_id,
           kickoff_utc, venue_name, status, created_at
    FROM fixtures_dim
    """,
)
def q_fixtures_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 dim fan-out: fixtures, first collection document creates the
    row (/root/reference/database_integration.py:154-174) — the
    final_data phase must NOT overwrite venue. Checks the ISO-Z
    kickoff parse and the 'Unknown' venue default.
    """
    return extract_fixtures(_game_bronze(load(spark, sf_dir, "orders")))


@query(
    "q_upcoming_games",
    oracle=_DOC_CTES
    + """,
    odds AS (
      SELECT fid, bookmaker, cat,
             (fid % 250 + phase * 7 + bd) / 100.0 + 1.1 AS home_odds,
             (fid % 170 + phase * 7 + bd) / 100.0 + 2.5 AS draw_odds,
             (fid % 310 + phase * 7 + bd) / 100.0 + 1.3 AS away_odds
      FROM docs CROSS JOIN (VALUES ('Alpha', 0), ('Beta', 3)) b(bookmaker, bd)
      WHERE fid % 2 = 0
    ),
    latest_odds AS (
      SELECT fid, home_odds, draw_odds, away_odds, bookmaker, cat AS odds_updated FROM (
        SELECT *, row_number() OVER (PARTITION BY fid
                                     ORDER BY cat DESC, bookmaker DESC) AS rn
        FROM odds
      ) WHERE rn = 1
    )
    SELECT f.id AS fixture_id, f.kickoff_utc,
           ht.name AS home_team, ta.name AS away_team,
           l.name AS league, l.country,
           o.home_odds, o.draw_odds, o.away_odds, o.bookmaker, o.odds_updated
    FROM fixtures_dim f
    JOIN teams_dim ht ON f.home_team_id = ht.id
    JOIN teams_dim ta ON f.away_team_id = ta.id
    JOIN leagues_dim l ON f.league_id = l.id AND f.season = l.season
    LEFT JOIN latest_odds o ON f.id = o.fid
    WHERE f.kickoff_utc > TIMESTAMP '1995-06-01 00:00:00' AND f.status = 'scheduled'
    """,
)
def q_upcoming_games(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's gold view, end-to-end over the engine's OWN
    silver tables: one synthesized bronze → extract_teams /
    extract_leagues / extract_fixtures / flatten_odds → the
    upcoming_games_with_odds composition
    (/root/reference/database_schema.sql:144-169).

    What the hash proves: the whole bronze→silver→gold lineage —
    replace-vs-ignore dim semantics, h2h odds flattening, the
    latest-snapshot window with its bookmaker tie-break, the future +
    scheduled predicate, and the LEFT join keeping odds-less (odd
    orderkey) fixtures with NULL odds columns.
    """
    bronze = _game_bronze(load(spark, sf_dir, "orders"))
    now = F.lit("1995-06-01 00:00:00").cast("timestamp")
    return upcoming_games_with_odds(
        fixtures=extract_fixtures(bronze),
        teams=extract_teams(bronze),
        leagues=extract_leagues(bronze),
        odds_history=flatten_odds(bronze),
        now=now,
    )


@query(
    "q_validate_counts",
    oracle=_DOC_CTES
    + """,
    odds AS (
      SELECT fid, cat FROM docs
      CROSS JOIN (VALUES ('Alpha'), ('Beta')) b(bookmaker)
      WHERE fid % 2 = 0
    ),
    counts AS (
      SELECT 'fixtures' AS table_name, COUNT(*) AS row_count,
             MAX(created_at) AS latest_ts FROM fixtures_dim
      UNION ALL
      SELECT 'odds', COUNT(*), MAX(cat) FROM odds
      UNION ALL
      SELECT 'teams', COUNT(*), MAX(updated_at) FROM teams_dim
      UNION ALL
      SELECT 'leagues', COUNT(*), MAX(created_at) FROM leagues_dim
    )
    SELECT c.table_name, c.row_count,
           CAST(r.lo AS BIGINT) AS expected_min,
           CAST(r.hi AS BIGINT) AS expected_max,
           c.row_count BETWEEN r.lo AND r.hi AS in_range,
           c.latest_ts,
           COALESCE(c.latest_ts >= TIMESTAMP '2001-07-31 00:30:00'
                    AND c.latest_ts <= TIMESTAMP '2001-08-01 00:30:00',
                    false) AS is_fresh
    FROM counts c
    JOIN (VALUES ('fixtures', 10, 30), ('odds', 30, 100),
                 ('teams', 20, 60), ('leagues', 5, 10))
         r(table_name, lo, hi)
      USING (table_name)
    """,
)
def q_validate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validate_data.py report (/root/reference/validate_data.py:
    20-73) over the engine's own silver tables: per-table row counts
    vs the reference's expected ranges, plus per-table freshness
    against a replay ``now`` of 2001-08-01 00:30 — between the last
    early_odds document (orderdates end 2001-08-01, collected at
    00:00) and the last final_data document (+1 h) — so the verdict
    exercises both branches: fixtures/leagues fresh, odds/teams
    not (their newest snapshot lies beyond the bounded window).
    """
    bronze = _game_bronze(load(spark, sf_dir, "orders"))
    now = F.lit("2001-08-01 00:30:00").cast("timestamp")
    return validate_counts(
        fixtures=extract_fixtures(bronze),
        odds_history=flatten_odds(bronze),
        teams=extract_teams(bronze),
        leagues=extract_leagues(bronze),
        now=now,
    )


@query(
    "q_team_odds_lookup",
    oracle=_DOC_CTES
    + """,
    odds AS (
      SELECT fid, bookmaker,
             CASE phase WHEN 0 THEN 'early_odds' ELSE 'final_data' END
               AS collection_phase,
             'h2h' AS market_type,
             (fid % 250 + phase * 7 + bd) / 100.0 + 1.1 AS home_odds,
             (fid % 170 + phase * 7 + bd) / 100.0 + 2.5 AS draw_odds,
             (fid % 310 + phase * 7 + bd) / 100.0 + 1.3 AS away_odds,
             cat AS collected_at
      FROM docs CROSS JOIN (VALUES ('Alpha', 0), ('Beta', 3)) b(bookmaker, bd)
      WHERE fid % 2 = 0
    ),
    matched AS (SELECT id FROM teams_dim WHERE name LIKE '%T10%'),
    next_game AS (
      SELECT f.id, f.kickoff_utc, ht.name AS home_team, ta.name AS away_team,
             l.name AS league
      FROM fixtures_dim f
      JOIN teams_dim ht ON f.home_team_id = ht.id
      JOIN teams_dim ta ON f.away_team_id = ta.id
      JOIN leagues_dim l ON f.league_id = l.id AND f.season = l.season
      WHERE (f.home_team_id IN (SELECT id FROM matched)
             OR f.away_team_id IN (SELECT id FROM matched))
        AND f.kickoff_utc > TIMESTAMP '1998-06-01 00:00:00'
      ORDER BY f.kickoff_utc, f.id
      LIMIT 1
    ),
    odds_top AS (
      SELECT o.* FROM odds o JOIN next_game g ON o.fid = g.id
      ORDER BY o.collected_at DESC, o.bookmaker DESC
      LIMIT 3
    )
    SELECT g.id AS fixture_id, g.kickoff_utc, g.home_team, g.away_team,
           g.league, o.bookmaker, o.collection_phase, o.market_type,
           o.home_odds, o.draw_odds, o.away_odds, o.collected_at
    FROM next_game g LEFT JOIN odds_top o ON o.fid = g.id
    """,
)
def q_team_odds_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Discord ``!odds`` command read path
    (/root/reference/discord_integration.py:135-160) end-to-end over
    the engine's own silver tables: '%T10%' team resolution → next
    fixture after a replay now of 1998-06-01 → latest 3 h2h snapshots
    with full game context.

    What the hash proves: the LIKE → OR-semi-join → top-1 fixture cut
    (with id tie-break), the per-fixture top-3 snapshot cut (with
    bookmaker tie-break), and that a no-odds game would still return
    its context row (LEFT semantics).
    """
    bronze = _game_bronze(load(spark, sf_dir, "orders"))
    now = F.lit("1998-06-01 00:00:00").cast("timestamp")
    return team_odds_lookup(
        fixtures=extract_fixtures(bronze),
        teams=extract_teams(bronze),
        leagues=extract_leagues(bronze),
        odds_history=flatten_odds(bronze),
        team_like="T10",
        now=now,
    )


@query(
    "q_odds_trends",
    oracle=_DOC_CTES
    + """,
    odds AS (
      SELECT fid, bookmaker,
             CASE phase WHEN 0 THEN 'early_odds' ELSE 'final_data' END
               AS collection_phase,
             'h2h' AS market_type,
             (fid % 250 + phase * 7 + bd) / 100.0 + 1.1 AS home_odds,
             (fid % 170 + phase * 7 + bd) / 100.0 + 2.5 AS draw_odds,
             (fid % 310 + phase * 7 + bd) / 100.0 + 1.3 AS away_odds,
             cat AS collected_at
      FROM docs CROSS JOIN (VALUES ('Alpha', 0), ('Beta', 3)) b(bookmaker, bd)
      WHERE fid % 2 = 0
    ),
    matched AS (SELECT id FROM teams_dim WHERE name LIKE '%T10%'),
    next_game AS (
      SELECT f.id, f.kickoff_utc, ht.name AS home_team, ta.name AS away_team
      FROM fixtures_dim f
      JOIN teams_dim ht ON f.home_team_id = ht.id
      JOIN teams_dim ta ON f.away_team_id = ta.id
      WHERE (f.home_team_id IN (SELECT id FROM matched)
             OR f.away_team_id IN (SELECT id FROM matched))
        AND f.kickoff_utc > TIMESTAMP '1995-05-01 00:00:00'
      ORDER BY f.kickoff_utc, f.id
      LIMIT 1
    ),
    trail AS (
      SELECT o.*, g.kickoff_utc, g.home_team, g.away_team
      FROM odds o JOIN next_game g ON o.fid = g.id
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY bookmaker, market_type
                                ORDER BY collected_at, collection_phase) AS rn_asc,
             row_number() OVER (PARTITION BY bookmaker, market_type
                                ORDER BY collected_at DESC, collection_phase DESC)
               AS rn_desc
      FROM trail
    ),
    movement AS (
      SELECT bookmaker, market_type,
             count(*) AS n_snapshots,
             max(CASE WHEN rn_asc = 1 THEN home_odds END) AS first_home,
             max(CASE WHEN rn_desc = 1 THEN home_odds END) AS last_home,
             max(CASE WHEN rn_asc = 1 THEN away_odds END) AS first_away,
             max(CASE WHEN rn_desc = 1 THEN away_odds END) AS last_away
      FROM ranked GROUP BY bookmaker, market_type
    )
    SELECT t.fid AS fixture_id, t.kickoff_utc, t.home_team, t.away_team,
           t.market_type, t.bookmaker, t.collection_phase,
           t.home_odds, t.draw_odds, t.away_odds, t.collected_at,
           m.n_snapshots, m.first_home, m.last_home,
           floor(((m.last_home - m.first_home) / m.first_home * 100.0) * 100 + 0.5) / 100
             AS home_change_pct,
           m.first_away, m.last_away,
           floor(((m.last_away - m.first_away) / m.first_away * 100.0) * 100 + 0.5) / 100
             AS away_change_pct
    FROM trail t
    JOIN movement m USING (bookmaker, market_type)
    """,
)
def q_odds_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Discord ``!trends`` read path
    (/root/reference/discord_integration.py:183-230 +
    database_integration.py:358-367) end-to-end over the engine's own
    silver tables: '%T10%' resolution → next fixture after the
    1995-05-01 replay now (chosen so the next game carries an odds
    trail at BOTH sf0.001 and sf0.01 — the prior 1998-06-01 pin made
    the sf0.01 driver row trivially empty, r6 fix) → its full odds trail joined with the
    per-(bookmaker, market) first-vs-last movement summary.

    What the hash proves: the trail point-lookup (4 snapshots: 2
    bookmakers × 2 phases), and that the W3 min_by/max_by summary
    picks the early_odds snapshot as first and final_data as last
    per bookmaker — with the exact percent-moved values replicated
    onto every trail row.
    """
    bronze = _game_bronze(load(spark, sf_dir, "orders"))
    now = F.lit("1995-05-01 00:00:00").cast("timestamp")
    return odds_trends(
        fixtures=extract_fixtures(bronze),
        teams=extract_teams(bronze),
        odds_history=flatten_odds(bronze),
        team_like="T10",
        now=now,
    )


@query(
    "q_league_teams",
    oracle=_DOC_CTES
    + """,
    roles AS (
      SELECT league_id, season, home_team_id AS team_id FROM fixtures_dim
      UNION ALL
      SELECT league_id, season, away_team_id FROM fixtures_dim
    ),
    roster AS (
      SELECT league_id, season, team_id, CAST(count(*) AS BIGINT) AS n_games
      FROM roles GROUP BY league_id, season, team_id
    )
    SELECT r.league_id, r.season, l.name AS league_name,
           r.team_id, t.name AS team_name, r.n_games
    FROM roster r
    JOIN teams_dim t ON r.team_id = t.id
    JOIN leagues_dim l ON r.league_id = l.id AND r.season = l.season
    """,
)
def q_league_teams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The teams-per-league roster (streamlit_dashboard.py:56-71
    ``get_teams`` + the ``!league`` bar chart,
    discord_integration.py:335-352) over the engine's own silver:
    bronze → dim extracts → gold.league_teams, unfiltered (the
    dashboard's all-leagues picker).

    What the hash proves: both fixture roles reach the roster (every
    team appears via home AND away arms), the per-(league, season,
    team) game count replaces the reference's DISTINCT-collapsed
    join multiplicity, and the dim joins carry the upsert-winning
    names (replace-latest for teams, first-wins for leagues).
    """
    from .gold import league_teams

    bronze = _game_bronze(load(spark, sf_dir, "orders"))
    return league_teams(
        teams=extract_teams(bronze),
        leagues=extract_leagues(bronze),
        fixtures=extract_fixtures(bronze),
    )
