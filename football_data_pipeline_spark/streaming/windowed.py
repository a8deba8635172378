"""T5 companion: event-time windowed volatility aggregation with a
late-data watermark.

The reference's dashboard aggregates odds activity per day/phase
(/root/reference/streamlit_dashboard.py:154-162) and its alert loop
scans the last hour of snapshots every 15 minutes
(/root/reference/discord_integration.py:469-498). The streaming-native
form of that hourly scan is a tumbling event-time window over the
snapshot stream: ``withWatermark`` bounds how late a snapshot may
arrive (the job queue's 45-minute expiry rule, yml:420-424, reused as
the lateness bound) so window state can be evicted; the aggregation
itself is the same declarative groupBy in batch and streaming.

The operator is written once and used both ways:
- batch: the oracle-checked q_windowed_volatility below;
- streaming: ``tests/test_streaming.py`` drives it through a file
  source + memory sink and asserts it converges to the batch answer.

Scale: tumbling windows hash-partition by (window, key) — state per
open window per key, bounded by the watermark; no sort, no whole-
stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import davg, oracle_davg, oracle_rnd, rnd
from ..registry import query

WATERMARK = "45 minutes"  # late-data bound, mirrors job expiry (T3)


def hourly_volatility(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Per (1-hour event-time window, event_type): snapshot count and
    value volatility (min/max/avg/span).

    Works on batch and streaming inputs; the watermark only binds in
    streaming mode (batch plans ignore it).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_snapshots"),
            rnd(F.min("value")).alias("min_value"),
            rnd(F.max("value")).alias("max_value"),
            davg(F.col("value")).alias("avg_value"),
            rnd(F.max("value") - F.min("value")).alias("value_span"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_snapshots",
            "min_value",
            "max_value",
            "avg_value",
            "value_span",
        )
    )


@query(
    "q_windowed_volatility",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_snapshots,
           {oracle_rnd('min(value)')} AS min_value,
           {oracle_rnd('max(value)')} AS max_value,
           {oracle_davg('value')} AS avg_value,
           {oracle_rnd('max(value) - min(value)')} AS value_span
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_windowed_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window volatility aggregation, batch-checked.

    ``F.window("1 hour").start`` is epoch-aligned, so the oracle's
    ``date_trunc('hour', ts)`` states the identical bucket.
    """
    return hourly_volatility(load(spark, sf_dir, "events"))


def user_sessions(
    events: DataFrame, gap_s: int | None = None, watermark: str = WATERMARK
) -> DataFrame:
    """Streaming twin of ``operators.sessions.sessionize``: per-user
    gap sessions via Spark's NATIVE ``session_window`` — state is one
    open window per user, merged as events arrive and EVICTED once
    the watermark passes the window's close (start of the trailing
    gap), so unbounded streams hold bounded state. The batch LAG
    formulation can't run on a stream (no ordered window over
    unbounded input); this is the operator rewritten for the
    streaming execution model rather than ported.

    Semantics parity (asserted in tests/test_streaming.py): Spark
    merges session windows that OVERLAP, and each event opens
    [t, t+gap) — an event landing exactly ``gap`` after the previous
    one still merges (measured), which is the same boundary the batch
    operator's strict ``> gap`` split keeps. Output columns mirror
    sessionize's (minus n_event_types, which would force an extra
    distinct state per window); works on batch and streaming inputs.
    """
    from ..operators.sessions import SESSION_GAP_S

    gap = f"{SESSION_GAP_S if gap_s is None else gap_s} seconds"
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            (
                F.max(F.unix_micros(F.col("ts")))
                - F.min(F.unix_micros(F.col("ts")))
            ).alias("duration_us"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "duration_us")
    )


def enrich_stream_stream(
    odds: DataFrame,
    fixtures: DataFrame,
    odds_watermark: str = "1 hour",
    fixture_watermark: str = "2 hours",
    lookback: str = "24 hours",
) -> DataFrame:
    """Stream-stream event-time interval join: each odds snapshot is
    enriched with its fixture's context row, accepting fixture
    records created up to ``lookback`` BEFORE the snapshot (the
    fixture normally lands first) or up to the snapshot instant
    (out-of-order arrival inside the watermark).

    The Structured Streaming join category the fan-out pipeline does
    not cover: both sides are unbounded, so BOTH carry watermarks and
    the join predicate carries an event-time RANGE — that pair is
    what lets Spark evict buffered state (fixtures older than
    lookback + watermark; odds older than their watermark) instead
    of holding both streams forever. Works identically on batch
    inputs (watermarks are no-ops there), so the same function is
    unit-checkable against a plain join.
    """
    o = odds.withWatermark("collected_at", odds_watermark) if odds.isStreaming else odds
    fx = (
        fixtures.withWatermark("created_at", fixture_watermark)
        if fixtures.isStreaming
        else fixtures
    )
    f = fx.select(
        F.col("id").alias("__fx_id"),
        F.col("kickoff_utc"),
        F.col("home_team_id"),
        F.col("away_team_id"),
        F.col("created_at"),
    )
    return o.join(
        f,
        (F.col("fixture_id") == F.col("__fx_id"))
        & (F.col("created_at") >= F.col("collected_at") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("created_at") <= F.col("collected_at")),
    ).select(
        "fixture_id",
        "bookmaker",
        "home_odds",
        "draw_odds",
        "away_odds",
        "collected_at",
        "kickoff_utc",
        "home_team_id",
        "away_team_id",
    )
