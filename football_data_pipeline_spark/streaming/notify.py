"""T6: the notification sink — Discord-webhook-shaped embed
formatting at the pipeline edge.

The reference posts webhook embeds for new-job batches
(.github/workflows/football-data-pipeline.yml:263-284), odds-movement
alerts (discord_integration.py:469-530) and generic notifications
(discord_integration.py:385-402). Formatting is pure data-to-dict
work; the HTTP POST is an edge effect. Split accordingly:

- embed row construction runs IN-ENGINE (``to_json(struct(...))``
  over the alert DataFrame — codegen'd, distributed, no UDF);
- ``notification_sink`` adapts it to ``foreachBatch`` and hands the
  finished payloads to an injected ``send`` callable (the webhook
  POST in production, a recorder in tests). No network code lives in
  the engine, and alert volume is top-k-bounded upstream, so the
  driver-side handoff is a few rows per batch by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FOOTER = "Football Data Pipeline"
COLOR_INFO = 0x0099FF  # discord_integration.py:388
COLOR_OK = 0x00FF00  # yml:269
COLOR_ALERT = 0xFF6600


def _to_unix(dt) -> int:
    """Epoch seconds from a timestamp PySpark collected. Non-Arrow
    collect() materializes TimestampType as a NAIVE datetime in the
    DRIVER's OS timezone (session timeZone=UTC does not change
    this), so interpret naive values as LOCAL time —
    ``datetime.timestamp()`` does exactly that — rather than
    reinterpreting the local wall clock as UTC (calendar.timegm),
    which skewed the Discord ``<t:...>`` stamp by the driver's UTC
    offset on any non-UTC box."""
    return int(dt.timestamp())


def _fmt(v, missing: str = "?"):
    """Render a nullable stat — a partially backfilled snapshot may
    carry NULLs in any stat column (the reference guards per field,
    discord_integration.py:258-270)."""
    return missing if v is None else v


def _fmt_pct(v, missing: str = "?") -> str:
    return missing if v is None else f"{v:.1f}%"


def movement_alert_embeds(movements: DataFrame, now_iso: str) -> DataFrame:
    """One webhook embed JSON per >10% movement alert row (input =
    the W2 movement query's output: fixture/bookmaker/odds/prev/
    pct_change + team names). Mirrors the reference's alert embed
    fields (discord_integration.py:506-530)."""
    title = F.concat(
        F.lit("\U0001f4c8 Odds Movement: "), F.col("home_team"), F.lit(" vs "), F.col("away_team")
    )
    description = F.concat(
        F.col("bookmaker"),
        F.lit(" home "),
        F.col("prev_home").cast("string"),
        F.lit(" → "),
        F.col("home_odds").cast("string"),
        F.lit(" ("),
        F.col("home_change_pct").cast("string"),
        F.lit("%)"),
    )
    embed = F.struct(
        title.alias("title"),
        description.alias("description"),
        F.lit(COLOR_ALERT).alias("color"),
        F.lit(now_iso).alias("timestamp"),
        F.struct(F.lit(FOOTER).alias("text")).alias("footer"),
    )
    # the ranking keys ride along so the sink can re-sort collected
    # rows driver-side — row order across a projection after
    # orderBy().limit() is an artifact of the current
    # TakeOrderedAndProject planning, not a guarantee (ADVICE r5)
    # NULL-safe ranking key: the movement filter is an OR over home
    # and away legs, so a row can qualify on away movement while
    # home_change_pct is NULL (prev_home NULL/0 on partially
    # backfilled stats). -inf matches the desc_nulls_last semantics
    # the pre-r6 orderBy-only form had; a bare None would TypeError
    # the driver-side sort and kill the whole foreachBatch sink
    # (ADVICE r6).
    return movements.select(
        F.to_json(embed).alias("embed_json"),
        F.coalesce(
            F.abs(F.col("home_change_pct")), F.lit(float("-inf"))
        ).alias("rank_abs_change"),
        F.col("fixture_id").alias("rank_fixture_id"),
        F.col("bookmaker").alias("rank_bookmaker"),
    )


def new_jobs_embed(n_games: int, n_jobs: int, matchups: list[str], now_iso: str) -> dict:
    """The job-creation notification embed (yml:263-284): top-5
    matchups as one field."""
    return {
        "title": "\U0001f3af New Games Scheduled",
        "description": f"Found {n_games} upcoming games\nCreated {n_jobs} collection jobs",
        "color": COLOR_OK,
        "fields": [
            {
                "name": "Next Collections",
                "value": "\n".join(f"⚽ {m}" for m in matchups[:5]),
                "inline": False,
            }
        ],
        "timestamp": now_iso,
    }


def simple_embed(title: str, description: str, now_iso: str, color: int = COLOR_INFO) -> dict:
    """send_webhook_notification's embed shape
    (discord_integration.py:385-395)."""
    return {
        "title": title,
        "description": description,
        "color": color,
        "timestamp": now_iso,
        "footer": {"text": FOOTER},
    }


def odds_lookup_embed(rows: list, now_iso: str) -> dict | None:
    """The ``!odds`` command response embed
    (discord_integration.py:161-177): one embed per lookup, a Kickoff
    field rendered as Discord timestamp markup ``<t:unix:F>``
    (discord_integration.py:166-167), then one field per odds
    snapshot row. ``rows`` is team_odds_lookup's output
    (≤ n_snapshots rows, all sharing the game context; a no-odds
    game yields one row with NULL bookmaker → zero odds fields, like
    the reference's empty loop). An EMPTY ``rows`` means no upcoming
    game matched — return None so the caller can send the
    reference's "No upcoming games found" text reply
    (discord_integration.py:152-154) instead of an embed."""
    if not rows:
        return None
    game = rows[0]
    kickoff_unix = _to_unix(game["kickoff_utc"])
    fields = [
        {
            "name": "⏰ Kickoff",
            "value": f"<t:{kickoff_unix}:F>",
            "inline": False,
        }
    ]
    for r in sorted(
        (r for r in rows if r["bookmaker"] is not None),
        key=lambda r: (r["collected_at"], r["bookmaker"]),
        reverse=True,
    ):
        fields.append(
            {
                "name": f"\U0001f4ca {r['bookmaker']} ({r['collection_phase']})",
                "value": (
                    f"**{game['home_team']}**: {r['home_odds']}\n"
                    f"**{game['away_team']}**: {r['away_odds']}\n"
                    f"Draw: {r['draw_odds']}\n"
                    f"Market: {r['market_type']}"
                ),
                "inline": True,
            }
        )
    return {
        "title": f"\U0001f3b2 Odds: {game['home_team']} vs {game['away_team']}",
        "description": f"**{game['league']}**",
        "color": COLOR_OK,
        "fields": fields,
        "timestamp": now_iso,
    }


COLOR_FORM = 0x00AAFF  # discord_integration.py:279


def team_form_embed(rows: list, now_iso: str) -> dict | None:
    """The ``!form`` command response embed
    (discord_integration.py:276-299): a Season Stats field from the
    latest statistics snapshot and a Recent Games field of venue
    icon + opponent lines. ``rows`` is team_form's output (≤ n_recent
    rows sharing the team/stats context; a stats-less team skips the
    stats field, a fixture-less team skips Recent Games — both like
    the reference's conditionals). Empty ``rows`` → None (the
    reference replies "Team not found"). The W/D/L ``result`` column
    is in every row for richer consumers; the reference's embed
    renders only icon + opponent, so this stays faithful to it."""
    if not rows:
        return None
    t = rows[0]
    fields = []
    if t["matches_played"] is not None:
        fields.append(
            {
                "name": "📈 Season Stats",
                "value": (
                    f"**Played**: {t['matches_played']}\n"
                    f"**Win Rate**: {_fmt_pct(t['win_percentage'])}\n"
                    f"**Goals**: {_fmt(t['goals_for'])}-{_fmt(t['goals_against'])}"
                ),
                "inline": True,
            }
        )
    recent = [r for r in rows if r["fixture_id"] is not None]
    if recent:
        lines = []
        for r in sorted(
            recent, key=lambda r: (r["kickoff_utc"], r["fixture_id"]), reverse=True
        ):
            icon = "🏠" if r["venue"] == "home" else "✈️"
            lines.append(f"{icon} vs {r['opponent']}")
        fields.append(
            {"name": "🏃 Recent Games", "value": "\n".join(lines), "inline": True}
        )
    return {
        "title": f"📊 {t['team_name']} - Team Form",
        "color": COLOR_FORM,
        "fields": fields,
        "timestamp": now_iso,
    }


#: discord_integration.py:74-78 — severity → embed color
SEVERITY_COLORS = {"minor": 0xFFFF00, "major": 0xFF9900, "season_ending": 0xFF0000}
COLOR_UNKNOWN_SEVERITY = 0x808080


def injury_alert_embed(event: dict, team_name: str, now_iso: str) -> dict:
    """The injury/suspension alert embed
    (discord_integration.py:72-98): severity-colored, optional
    player and expected-return fields. ``event`` is a
    detect_lineup_changes / team_events row (operators/events.py);
    ``team_name`` is the resolved team dim name (the reference's
    event rows carry it pre-joined)."""
    fields = []
    if event.get("player_name") or event.get("player_id") is not None:
        fields.append(
            {
                "name": "👤 Player",
                "value": event.get("player_name") or f"#{event['player_id']}",
                "inline": True,
            }
        )
    fields.append(
        {
            "name": "📝 Details",
            "value": event.get("event_description") or "No details available",
            "inline": False,
        }
    )
    fields.append(
        {
            "name": "⚠️ Severity",
            "value": event.get("severity") or "Unknown",
            "inline": True,
        }
    )
    if event.get("end_date"):
        fields.append(
            {"name": "📅 Expected Return", "value": str(event["end_date"]), "inline": True}
        )
    return {
        "title": f"🚑 {event['event_type'].replace('_', ' ').title()} Alert",
        "description": f"**{team_name}**",
        "color": SEVERITY_COLORS.get(event.get("severity"), COLOR_UNKNOWN_SEVERITY),
        "fields": fields,
        "timestamp": now_iso,
    }


#: bounded-edge contract (VERDICT r4 #2): never collect an unbounded
#: micro-batch to the driver — a pathological mass odds swing could
#: produce millions of alert rows. The biggest alerts (by |Δ%|) are
#: kept; the rest become one overflow-notice embed with the exact
#: suppressed count.
MAX_ALERTS_PER_BATCH = 25
#: Discord rejects webhook messages with more than 10 embeds
#: (HTTP 400) — the sink chunks its sends under this limit so the
#: capped batch is deliverable exactly when alerts spike
DISCORD_MAX_EMBEDS = 10


def notification_sink(
    send: Callable[[dict], None], now_iso: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch adapter: format each micro-batch of alert rows
    in-engine, then hand the (top-k-bounded) embed payloads to
    ``send``. Inject the webhook POST in production; tests inject a
    recorder. The collect is capped at MAX_ALERTS_PER_BATCH (largest
    movements first, deterministic tie-break); overflow is reported
    as a count, never collected."""
    import json

    def sink(batch: DataFrame, batch_id: int) -> None:
        ranked = batch.orderBy(
            F.abs(F.col("home_change_pct")).desc(),
            "fixture_id",
            "bookmaker",
        ).limit(MAX_ALERTS_PER_BATCH + 1)
        rows = movement_alert_embeds(ranked, now_iso).collect()
        # re-establish the ranking driver-side: collect order after a
        # projection over orderBy().limit() is plan-dependent, and a
        # silent plan change must not turn "largest 25" into "an
        # arbitrary 25" (ADVICE r5)
        rows.sort(key=lambda r: (-r.rank_abs_change, r.rank_fixture_id, r.rank_bookmaker))
        overflow = 0
        if len(rows) > MAX_ALERTS_PER_BATCH:
            rows = rows[:MAX_ALERTS_PER_BATCH]
            # exact suppressed count: one distributed aggregate, no
            # extra rows cross the driver boundary
            overflow = batch.count() - MAX_ALERTS_PER_BATCH
        embeds = [json.loads(r.embed_json) for r in rows]
        if overflow:
            embeds.append(
                simple_embed(
                    "⚠️ Alert overflow",
                    f"{overflow} additional movement alerts suppressed this batch",
                    now_iso,
                    color=COLOR_ALERT,
                )
            )
        sink.overflow_total += overflow
        for i in range(0, len(embeds), DISCORD_MAX_EMBEDS):
            send({"embeds": embeds[i : i + DISCORD_MAX_EMBEDS]})

    sink.overflow_total = 0
    return sink
