"""team_events: lineup-change detection → injury/suspension alert rows.

The reference declares the ``team_events`` table
(/root/reference/database_schema.sql:85-97: team_id, player_id,
event_type, event_description, severity, start_date, end_date,
detected_at, source) and an alert consumer
(discord_integration.py:72-98 severity-colored embeds;
database_integration.py:377-415 event-impact analysis), but its
detection logic (``_detect_team_events``,
database_integration.py:334-356) is literally a ``pass``-body stub —
the comments sketch "comparison with previous lineups". This module
implements that intended detection, with the divergences documented:

- the comparison is per team over the fixture sequence (ordered by
  kickoff, fixture id): a player who STARTED the team's previous
  fixture but is absent from the current startXI yields one
  ``lineup_change`` event row;
- severity is a deterministic heuristic the reference never defines:
  a missing CAPTAIN is ``major``, any other missing starter is
  ``minor`` (``season_ending`` is reserved for external sources);
- ``source`` is ``lineup_analysis`` (the reference enumerates
  'api'/'manual'/'news_scraping'; this detector is a fourth,
  honestly-labeled origin); ``end_date`` stays NULL — unknowable
  from lineups alone.

Scale shape: one window (dense_rank per team — high-cardinality
partition key), one anti join and one equi join, all keyed on
(team_id, seq[, player_id]); no global sort, no driver-side state.
The event stream feeds the engine's existing event-impact analysis
(q_before_after) exactly as database_integration.py:377-415 intends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .flatten import flatten_lineups


def detect_lineup_changes(lineups: DataFrame, fixtures: DataFrame) -> DataFrame:
    """N5 output + fixtures → team_events rows (schema:
    database_schema.sql:85-97 minus the autoincrement id).

    ``lineups`` is flatten_lineups output (fixture_id, team_id,
    player_id, player_name, is_starter, is_captain, collected_at);
    ``fixtures`` supplies each fixture's kickoff for the per-team
    sequence and the event's start_date.
    """
    fx = fixtures.select(F.col("id").alias("__fx_id"), "kickoff_utc")
    starters = (
        lineups.filter(F.col("is_starter"))
        .join(fx, lineups.fixture_id == fx.__fx_id)
        .select(
            "team_id",
            "fixture_id",
            "kickoff_utc",
            "player_id",
            "player_name",
            "is_captain",
            "collected_at",
        )
    )
    seq = F.dense_rank().over(
        Window.partitionBy("team_id").orderBy("kickoff_utc", "fixture_id")
    )
    cur = starters.withColumn("seq", seq)
    # the current fixture per (team, seq) — all rows of a (team, seq)
    # group share one fixture, so max() is just a deterministic pick
    cur_fx = cur.groupBy("team_id", "seq").agg(
        F.max("fixture_id").alias("fixture_id"),
        F.max("kickoff_utc").alias("kickoff_utc"),
        F.max("collected_at").alias("detected_at"),
    )
    # dedup KEYED (team, seq, player): the reference pipeline
    # collects a fixture in multiple phases, so a starter can appear
    # once per collection — and re-collections may also differ in
    # name/captain corrections, which a plain distinct would keep as
    # separate rows (two events for one absence). The latest
    # collection wins; collected_at ties break on the struct's
    # remaining fields, deterministically.
    prev = (
        cur.groupBy("team_id", "seq", "player_id")
        .agg(
            F.max(
                F.struct("collected_at", "is_captain", "player_name")
            ).alias("__s")
        )
        .select(
            "team_id",
            (F.col("seq") + 1).alias("seq"),
            "player_id",
            F.col("__s.player_name").alias("player_name"),
            F.col("__s.is_captain").alias("is_captain"),
        )
    )
    missing = prev.join(
        cur.select("team_id", "seq", "player_id"),
        ["team_id", "seq", "player_id"],
        "left_anti",
    )
    # inner join: a phantom seq past the team's last fixture has no
    # current-fixture row and drops out here
    return missing.join(cur_fx, ["team_id", "seq"]).select(
        "team_id",
        "player_id",
        F.lit("lineup_change").alias("event_type"),
        F.concat(
            F.lit("Starter "),
            F.col("player_name"),
            F.lit(" absent from lineup vs previous fixture"),
        ).alias("event_description"),
        F.when(F.col("is_captain"), "major").otherwise("minor").alias("severity"),
        F.to_date("kickoff_utc").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
        "detected_at",
        F.lit("lineup_analysis").alias("source"),
    )


@query(
    "q_team_events",
    oracle="""
    WITH slots(s) AS (VALUES (0), (1), (2), (3)),
    starters AS (
      SELECT o_custkey % 100 AS team_id, o_orderkey AS fixture_id,
             CAST(o_orderdate AS TIMESTAMP) AS kickoff_utc,
             CAST(o_orderdate AS TIMESTAMP) AS collected_at,
             (o_custkey % 100) * 10 + s AS player_id,
             'P-' || CAST((o_custkey % 100) * 10 + s AS VARCHAR) AS player_name,
             s = 0 AS is_captain
      FROM orders CROSS JOIN slots
      WHERE (o_orderkey + s) % 4 <> 0
    ),
    seqd AS (
      SELECT *, dense_rank() OVER (PARTITION BY team_id
                                   ORDER BY kickoff_utc, fixture_id) AS seq
      FROM starters
    ),
    cur_fx AS (
      SELECT team_id, seq, max(fixture_id) AS fixture_id,
             max(kickoff_utc) AS kickoff_utc,
             max(collected_at) AS detected_at
      FROM seqd GROUP BY team_id, seq
    ),
    missing AS (
      SELECT DISTINCT p.team_id, p.seq + 1 AS seq, p.player_id,
             p.player_name, p.is_captain
      FROM seqd p
      WHERE NOT EXISTS (
        SELECT 1 FROM seqd c
        WHERE c.team_id = p.team_id AND c.seq = p.seq + 1
          AND c.player_id = p.player_id
      )
    )
    SELECT m.team_id, m.player_id,
           'lineup_change' AS event_type,
           'Starter ' || m.player_name
             || ' absent from lineup vs previous fixture' AS event_description,
           CASE WHEN m.is_captain THEN 'major' ELSE 'minor' END AS severity,
           strftime(f.kickoff_utc, '%Y-%m-%d') AS start_date,
           CAST(NULL AS VARCHAR) AS end_date,
           f.detected_at,
           'lineup_analysis' AS source
    FROM missing m
    JOIN cur_fx f USING (team_id, seq)
    """,
)
def q_team_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineup-change detection end-to-end through the REAL N5
    flattener: synthesize a lineups document per order (team =
    o_custkey % 100, 4 squad slots of which slot s sits out when
    (o_orderkey + s) % 4 == 0 — so the missing starter rotates
    across a team's fixture sequence), run ``flatten_lineups`` then
    ``detect_lineup_changes``.

    What the hash proves: the per-team dense_rank sequence (kickoff
    + fixture-id tie-break), the prev-vs-current startXI anti join,
    the phantom-seq cut, the captain→major severity rule, and the
    DDL-faithful event-row projection
    (/root/reference/database_schema.sql:85-97).
    """
    orders = load(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    team_id = F.col("o_custkey") % 100

    def slot(s: int):
        pid = team_id * 10 + s
        return F.struct(
            F.lit(s).alias("slot"),
            F.struct(
                pid.alias("id"),
                F.concat(F.lit("P-"), pid.cast("string")).alias("name"),
                F.lit("M").alias("pos"),
                F.lit(s == 0).alias("captain"),
            ).alias("player"),
        )

    start_xi = F.transform(
        F.filter(
            F.array(*[slot(s) for s in range(4)]),
            lambda x: (key + x["slot"]) % 4 != 0,
        ),
        lambda x: x["player"],
    )
    subs = F.array().cast(
        "array<struct<player:struct<id:bigint,name:string,pos:string,captain:boolean>>>"
    )
    team_entry = F.struct(
        F.struct(team_id.alias("id")).alias("team"),
        F.lit("4-4-2").alias("formation"),
        F.transform(start_xi, lambda p: F.struct(p.alias("player"))).alias("startXI"),
        subs.alias("substitutes"),
    )
    bronze = orders.select(
        key.alias("fixture_id"),
        F.col("o_orderdate").cast("timestamp").alias("collected_at_ts"),
        F.struct(
            F.struct(F.array(team_entry).alias("response")).alias("lineups")
        ).alias("data"),
    )
    fixtures = orders.select(
        key.alias("id"), F.col("o_orderdate").cast("timestamp").alias("kickoff_utc")
    )
    events = detect_lineup_changes(flatten_lineups(bronze), fixtures)
    # DATE → ISO string at the query edge (oracle-comparable form;
    # the operator itself keeps DateType, like q_h2h_flatten)
    return events.withColumn(
        "start_date", F.date_format("start_date", "yyyy-MM-dd")
    ).withColumn("end_date", F.col("end_date").cast("string"))
