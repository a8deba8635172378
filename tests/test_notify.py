"""T6 notification formatting: embed shapes match the reference's
webhook payloads; the foreachBatch sink hands formatted payloads to
the injected sender.
"""

from __future__ import annotations

import json

from football_data_pipeline_spark.streaming.notify import (
    COLOR_ALERT,
    movement_alert_embeds,
    new_jobs_embed,
    notification_sink,
    simple_embed,
)

NOW = "2024-03-01T12:00:00"


def _movements(spark):
    return spark.createDataFrame(
        [(1, "Bet365", 2.5, 2.0, 2.0, 2.2, 25.0, "Arsenal", "Chelsea")],
        "fixture_id long, bookmaker string, home_odds double, prev_home double, "
        "away_odds double, prev_away double, home_change_pct double, "
        "home_team string, away_team string",
    )


def test_movement_embed_shape(spark):
    [row] = movement_alert_embeds(_movements(spark), NOW).collect()
    embed = json.loads(row.embed_json)
    # reference embed schema: discord_integration.py:385-395
    assert set(embed) == {"title", "description", "color", "timestamp", "footer"}
    assert embed["title"] == "📈 Odds Movement: Arsenal vs Chelsea"
    assert "2.0 → 2.5" in embed["description"]
    assert embed["color"] == COLOR_ALERT
    assert embed["footer"] == {"text": "Football Data Pipeline"}


def test_jobs_and_simple_embeds():
    jobs = new_jobs_embed(7, 28, [f"H{i} vs A{i}" for i in range(8)], NOW)
    assert set(jobs) == {"title", "description", "color", "fields", "timestamp"}
    assert jobs["fields"][0]["value"].count("⚽") == 5  # top-5 cap
    simple = simple_embed("t", "d", NOW)
    assert set(simple) == {"title", "description", "color", "timestamp", "footer"}


def test_notification_sink_delivers(spark):
    sent = []
    sink = notification_sink(sent.append, NOW)
    sink(_movements(spark), batch_id=0)
    assert len(sent) == 1 and len(sent[0]["embeds"]) == 1
    # empty batch → no webhook call
    sink(_movements(spark).limit(0), batch_id=1)
    assert len(sent) == 1


def test_notification_sink_caps_collect(spark):
    """Bounded-edge contract (VERDICT r4 #2): a pathological micro-
    batch (mass odds swing) must not collect every embed to the
    driver — the sink keeps MAX_ALERTS_PER_BATCH biggest movements
    and reports the exact suppressed count."""
    from football_data_pipeline_spark.streaming.notify import MAX_ALERTS_PER_BATCH

    n = MAX_ALERTS_PER_BATCH + 17
    batch = spark.createDataFrame(
        [
            (i, "Bet365", 2.5, 2.0, 2.0, 2.2, float(10 + i), f"H{i}", f"A{i}")
            for i in range(n)
        ],
        "fixture_id long, bookmaker string, home_odds double, prev_home double, "
        "away_odds double, prev_away double, home_change_pct double, "
        "home_team string, away_team string",
    )
    from football_data_pipeline_spark.streaming.notify import DISCORD_MAX_EMBEDS

    sent = []
    sink = notification_sink(sent.append, NOW)
    sink(batch, batch_id=0)
    embeds = [e for payload in sent for e in payload["embeds"]]
    # MAX alert embeds + 1 overflow notice, chunked under Discord's
    # 10-embeds-per-message webhook limit
    assert all(len(p["embeds"]) <= DISCORD_MAX_EMBEDS for p in sent)
    assert len(sent) == -(-(MAX_ALERTS_PER_BATCH + 1) // DISCORD_MAX_EMBEDS)
    assert len(embeds) == MAX_ALERTS_PER_BATCH + 1
    assert sink.overflow_total == 17
    assert f"17 additional movement alerts" in embeds[-1]["description"]
    # the kept alerts are the LARGEST movements (highest |Δ%|)
    assert f"H{n - 1} vs A{n - 1}" in embeds[0]["title"]
    # non-overflowing batch leaves the counter alone
    n_msgs = len(sent)
    sink(_movements(spark), batch_id=1)
    assert sink.overflow_total == 17 and len(sent) == n_msgs + 1


def test_notification_sink_survives_null_home_change(spark):
    """ADVICE r6 regression: the movement filter is an OR over home
    and away legs, so a row can qualify on away movement while
    home_change_pct is NULL (prev_home NULL on partially backfilled
    stats). The driver-side re-sort must rank it last (the old
    -r.rank_abs_change key raised TypeError on None and killed the
    whole foreachBatch sink)."""
    batch = spark.createDataFrame(
        [
            (1, "Bet365", 2.5, 2.0, 2.0, 2.2, 25.0, "Arsenal", "Chelsea"),
            (2, "Bet365", 2.5, None, 2.0, 2.8, None, "Leeds", "Derby"),
            (3, "Bet365", 2.2, 2.0, 2.0, 2.2, 10.0, "Spurs", "Wolves"),
        ],
        "fixture_id long, bookmaker string, home_odds double, prev_home double, "
        "away_odds double, prev_away double, home_change_pct double, "
        "home_team string, away_team string",
    )
    sent = []
    sink = notification_sink(sent.append, NOW)
    sink(batch, batch_id=0)
    embeds = [e for payload in sent for e in payload["embeds"]]
    assert len(embeds) == 3
    # NULL-movement row sorts last, real movements by |Δ%| desc
    assert "Arsenal" in embeds[0]["title"]
    assert "Spurs" in embeds[1]["title"]
    assert "Leeds" in embeds[2]["title"]


def test_odds_lookup_embed_shape(spark):
    """!odds command end-to-end on crafted silver: LIKE resolution →
    next fixture → top-3 snapshots → the reference's embed document
    (discord_integration.py:161-177)."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.gold import team_odds_lookup
    from football_data_pipeline_spark.streaming.notify import odds_lookup_embed

    now = F.lit("1995-06-01 00:00:00").cast("timestamp")
    fixtures = spark.createDataFrame(
        # fixture 2 is Arsenal's NEXT game; fixture 1 is in the past,
        # fixture 3 later than 2, fixture 4 doesn't involve Arsenal
        [(1, 10, 11, 7, 1995, "1995-05-01 15:00:00"),
         (2, 12, 10, 7, 1995, "1995-06-03 15:00:00"),
         (3, 10, 12, 7, 1995, "1995-06-10 15:00:00"),
         (4, 11, 12, 7, 1995, "1995-06-02 15:00:00")],
        "id long, home_team_id long, away_team_id long, league_id long, "
        "season int, k string",
    ).select("*", F.to_timestamp("k").alias("kickoff_utc")).drop("k")
    teams = spark.createDataFrame(
        [(10, "Arsenal FC"), (11, "Chelsea"), (12, "Liverpool")],
        "id long, name string",
    )
    leagues = spark.createDataFrame(
        [(7, 1995, "Premier League", "England")],
        "id long, season int, name string, country string",
    )
    odds = spark.createDataFrame(
        [(2, "Alpha", "h2h", 2.0, 3.0, 4.0, "early_odds", "1995-05-30 10:00:00"),
         (2, "Beta", "h2h", 2.1, 3.1, 4.1, "early_odds", "1995-05-30 10:00:00"),
         (2, "Alpha", "h2h", 2.2, 3.2, 4.2, "final_data", "1995-05-31 10:00:00"),
         (2, "Beta", "h2h", 2.3, 3.3, 4.3, "final_data", "1995-05-31 10:00:00"),
         (2, "Alpha", "totals", None, None, None, "early_odds", "1995-05-31 12:00:00"),
         (3, "Alpha", "h2h", 9.0, 9.0, 9.0, "early_odds", "1995-05-31 10:00:00")],
        "fixture_id long, bookmaker string, market_type string, "
        "home_odds double, draw_odds double, away_odds double, "
        "collection_phase string, c string",
    ).select("*", F.to_timestamp("c").alias("collected_at")).drop("c")

    rows = [
        r.asDict()
        for r in team_odds_lookup(fixtures, teams, leagues, odds, "Arsenal", now).collect()
    ]
    # fixture 2 (earliest upcoming Arsenal game, away role), top-3 of
    # its four h2h snapshots (totals row excluded): both finals + Beta
    # early via the bookmaker-DESC tiebreak
    assert {r["fixture_id"] for r in rows} == {2}
    assert {(r["bookmaker"], r["collection_phase"]) for r in rows} == {
        ("Alpha", "final_data"), ("Beta", "final_data"), ("Beta", "early_odds")
    }

    embed = odds_lookup_embed(rows, "1995-06-01T00:00:00")
    assert set(embed) == {"title", "description", "color", "fields", "timestamp"}
    assert embed["title"] == "🎲 Odds: Liverpool vs Arsenal FC"
    assert embed["description"] == "**Premier League**"
    assert embed["fields"][0]["name"] == "⏰ Kickoff"
    # reference renders Discord timestamp markup (<t:unix:F>),
    # discord_integration.py:166-167; kickoff is UTC
    from datetime import datetime, timezone

    unix = int(datetime(1995, 6, 3, 15, 0, tzinfo=timezone.utc).timestamp())
    assert embed["fields"][0]["value"] == f"<t:{unix}:F>"
    assert len(embed["fields"]) == 4  # kickoff + 3 snapshots
    assert embed["fields"][1]["name"] == "📊 Beta (final_data)"
    assert "**Arsenal FC**: 4.3" in embed["fields"][1]["value"]
    assert "Market: h2h" in embed["fields"][1]["value"]

    # a game with no odds still renders: context row, zero odds fields
    no_odds = team_odds_lookup(fixtures, teams, leagues, odds.limit(0), "Arsenal", now)
    rows2 = [r.asDict() for r in no_odds.collect()]
    assert len(rows2) == 1 and rows2[0]["bookmaker"] is None
    embed2 = odds_lookup_embed(rows2, "1995-06-01T00:00:00")
    assert len(embed2["fields"]) == 1  # kickoff only


def test_odds_lookup_no_matching_team(spark):
    """No team matches the LIKE term → empty result (the reference
    replies 'No upcoming games found'), and no odds-side work leaks."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.gold import team_odds_lookup

    now = F.lit("1995-06-01 00:00:00").cast("timestamp")
    fixtures = spark.createDataFrame(
        [(1, 10, 11, 7, 1995, "1995-06-03 15:00:00")],
        "id long, home_team_id long, away_team_id long, league_id long, "
        "season int, k string",
    ).select("*", F.to_timestamp("k").alias("kickoff_utc")).drop("k")
    teams = spark.createDataFrame([(10, "Arsenal"), (11, "Chelsea")], "id long, name string")
    leagues = spark.createDataFrame(
        [(7, 1995, "PL", "EN")], "id long, season int, name string, country string"
    )
    odds = spark.createDataFrame(
        [], "fixture_id long, bookmaker string, market_type string, home_odds double, "
        "draw_odds double, away_odds double, collection_phase string, collected_at timestamp",
    )
    out = team_odds_lookup(fixtures, teams, leagues, odds, "Nonexistent United", now)
    assert out.count() == 0
    # and the embed builder signals "no game" instead of raising
    from football_data_pipeline_spark.streaming.notify import odds_lookup_embed

    assert odds_lookup_embed([], "1995-06-01T00:00:00") is None


def _form_silver(spark):
    from pyspark.sql import functions as F

    teams = spark.createDataFrame(
        [(10, "Arsenal FC"), (11, "Chelsea"), (12, "Liverpool")], "id long, name string"
    )
    fixtures = spark.createDataFrame(
        # 1: Arsenal home win 2-1; 2: Arsenal away loss 3-0; 3: draw 1-1 (home);
        # 4: future (excluded); 5: scheduled status (excluded)
        [(1, 10, 11, "1995-05-20 15:00:00", "finished", 2, 1),
         (2, 12, 10, "1995-05-13 15:00:00", "finished", 3, 0),
         (3, 10, 12, "1995-05-06 15:00:00", "finished", 1, 1),
         (4, 10, 11, "1995-06-10 15:00:00", "finished", 9, 9),
         (5, 11, 10, "1995-05-27 15:00:00", "scheduled", None, None)],
        "id long, home_team_id long, away_team_id long, k string, status string, "
        "home_score int, away_score int",
    ).select("*", F.to_timestamp("k").alias("kickoff_utc")).drop("k")
    stats = spark.createDataFrame(
        [(10, 7, "1995-05-01", 30, 18, 55, 20, 60.0, "1995-05-01 00:00:00"),
         (10, 7, "1995-05-21", 32, 20, 60, 21, 62.5, "1995-05-21 00:00:00"),
         (11, 7, "1995-05-21", 32, 10, 30, 40, 31.25, "1995-05-21 00:00:00")],
        "team_id long, league_id long, collection_date string, matches_played long, "
        "wins long, goals_for long, goals_against long, win_percentage double, c string",
    ).select("*", F.to_timestamp("c").alias("created_at")).drop("c")
    return teams, stats, fixtures


def test_team_form_and_embed_shape(spark):
    """!form end-to-end on crafted silver: LIKE resolution → latest
    stats → last-5 completed with venue/W-D-L → the reference's embed
    (discord_integration.py:232-301)."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.gold import team_form
    from football_data_pipeline_spark.streaming.notify import COLOR_FORM, team_form_embed

    teams, stats, fixtures = _form_silver(spark)
    now = F.lit("1995-06-01 00:00:00").cast("timestamp")
    rows = [
        r.asDict()
        for r in team_form(teams, stats, fixtures, "Arsenal", now).collect()
    ]
    # three completed fixtures, newest first by kickoff in the embed;
    # every row carries the LATEST stats snapshot (May 21, not May 1)
    assert len(rows) == 3
    assert all(r["matches_played"] == 32 and r["win_percentage"] == 62.5 for r in rows)
    by_fx = {r["fixture_id"]: r for r in rows}
    assert (by_fx[1]["venue"], by_fx[1]["result"], by_fx[1]["opponent"]) == ("home", "W", "Chelsea")
    assert (by_fx[2]["venue"], by_fx[2]["result"], by_fx[2]["opponent"]) == ("away", "L", "Liverpool")
    assert (by_fx[3]["venue"], by_fx[3]["result"], by_fx[3]["opponent"]) == ("home", "D", "Liverpool")

    embed = team_form_embed(rows, "1995-06-01T00:00:00")
    assert embed["title"] == "📊 Arsenal FC - Team Form"
    assert embed["color"] == COLOR_FORM
    assert embed["fields"][0]["name"] == "📈 Season Stats"
    assert "**Win Rate**: 62.5%" in embed["fields"][0]["value"]
    # venue icons, newest game first (kickoff DESC like the reference query)
    assert embed["fields"][1]["value"].splitlines() == [
        "🏠 vs Chelsea", "✈️ vs Liverpool", "🏠 vs Liverpool"
    ]

    # unresolved team → zero rows → None embed ("Team not found")
    assert team_form(teams, stats, fixtures, "Nonexistent", now).count() == 0
    assert team_form_embed([], "1995-06-01T00:00:00") is None


def test_team_form_stats_only_and_fixtures_only(spark):
    """A resolved team with no completed fixtures still yields its
    stats context row; one with fixtures but no stats yields NULL
    stats columns — both render (reference's conditional fields)."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.gold import team_form
    from football_data_pipeline_spark.streaming.notify import team_form_embed

    teams, stats, fixtures = _form_silver(spark)
    now = F.lit("1995-06-01 00:00:00").cast("timestamp")
    # Chelsea: stats row exists; only completed game is fixture 1 (away)
    rows = [r.asDict() for r in team_form(teams, stats, fixtures, "Chelsea", now).collect()]
    assert len(rows) == 1 and rows[0]["venue"] == "away" and rows[0]["result"] == "L"
    # Liverpool: fixtures but NO stats row → NULL stats, embed skips the field
    rows = [r.asDict() for r in team_form(teams, stats, fixtures, "Liverpool", now).collect()]
    assert len(rows) == 2 and all(r["matches_played"] is None for r in rows)
    embed = team_form_embed(rows, "1995-06-01T00:00:00")
    assert [f["name"] for f in embed["fields"]] == ["🏃 Recent Games"]


def test_injury_alert_embed_shape():
    """Severity-colored injury alert embed
    (discord_integration.py:72-98) over a team_events row."""
    from football_data_pipeline_spark.streaming.notify import (
        SEVERITY_COLORS,
        injury_alert_embed,
    )

    event = {
        "event_type": "lineup_change",
        "player_id": 105,
        "player_name": "P-105",
        "event_description": "Starter P-105 absent from lineup vs previous fixture",
        "severity": "major",
        "end_date": None,
    }
    embed = injury_alert_embed(event, "Arsenal FC", "1995-06-01T00:00:00")
    assert embed["title"] == "🚑 Lineup Change Alert"
    assert embed["description"] == "**Arsenal FC**"
    assert embed["color"] == SEVERITY_COLORS["major"]
    names = [f["name"] for f in embed["fields"]]
    assert names == ["👤 Player", "📝 Details", "⚠️ Severity"]  # no end_date → no return field
    # unknown severity → gray; end_date present → Expected Return field
    embed2 = injury_alert_embed(
        {"event_type": "injury", "severity": None, "end_date": "1995-07-01",
         "event_description": None, "player_id": None},
        "Chelsea", "1995-06-01T00:00:00",
    )
    assert embed2["color"] == 0x808080
    assert embed2["fields"][0]["name"] == "📝 Details"
    assert embed2["fields"][0]["value"] == "No details available"
    assert embed2["fields"][-1]["name"] == "📅 Expected Return"


def test_subscriptions_setup_subscribe_route(spark):
    """Surface parity with !fb setup / !fb subscribe
    (discord_integration.py:303-330): last write wins per
    (guild, alert_type); subscribe replaces the whole pref set;
    'all' is the routing wildcard; invalid inputs raise the bot's
    own validation messages."""
    import datetime as dt

    import pytest as _pytest

    from football_data_pipeline_spark.streaming.subscriptions import (
        CHANNELS_SCHEMA,
        SUBS_SCHEMA,
        channels_for,
        set_channel,
        set_subscription,
        subscribers_for,
    )

    t0 = dt.datetime(2026, 8, 1)
    t1 = dt.datetime(2026, 8, 2)
    empty = spark.createDataFrame([], CHANNELS_SCHEMA)
    ch = set_channel(
        empty, spark.createDataFrame([(1, "odds", 100, t0), (2, "odds", 200, t0)], CHANNELS_SCHEMA)
    )
    # re-running setup moves the route (dict assignment semantics)
    ch = set_channel(ch, spark.createDataFrame([(1, "odds", 111, t1)], CHANNELS_SCHEMA))
    routed = {r.guild_id: r.channel_id for r in channels_for(ch, "odds").collect()}
    assert routed == {1: 111, 2: 200}
    with _pytest.raises(ValueError, match="alert type"):
        set_channel(ch, spark.createDataFrame([(1, "weather", 5, t1)], CHANNELS_SCHEMA))

    subs = set_subscription(
        spark.createDataFrame([], SUBS_SCHEMA),
        spark.createDataFrame([(7, "odds", t0), (7, "injuries", t0), (8, "all", t0)], SUBS_SCHEMA),
    )
    # wholesale replacement: user 7 re-subscribes to games only
    subs = set_subscription(subs, spark.createDataFrame([(7, "games", t1)], SUBS_SCHEMA))
    assert {r.user_id for r in subscribers_for(subs, "odds").collect()} == {8}
    assert {r.user_id for r in subscribers_for(subs, "games").collect()} == {7, 8}
    with _pytest.raises(ValueError, match="Valid preferences"):
        set_subscription(subs, spark.createDataFrame([(9, "cricket", t1)], SUBS_SCHEMA))


def test_subscriptions_null_and_duplicate_handling(spark):
    """NULL alert types / prefs must raise (not silently persist an
    unroutable row), and duplicate prefs in one subscribe command
    store a single row."""
    import datetime as dt

    import pytest as _pytest

    from football_data_pipeline_spark.streaming.subscriptions import (
        CHANNELS_SCHEMA,
        SUBS_SCHEMA,
        set_channel,
        set_subscription,
    )

    t0 = dt.datetime(2026, 8, 1)
    with _pytest.raises(ValueError, match="alert type"):
        set_channel(
            spark.createDataFrame([], CHANNELS_SCHEMA),
            spark.createDataFrame([(1, None, 5, t0)], CHANNELS_SCHEMA),
        )
    with _pytest.raises(ValueError, match="Valid preferences"):
        set_subscription(
            spark.createDataFrame([], SUBS_SCHEMA),
            spark.createDataFrame([(7, None, t0)], SUBS_SCHEMA),
        )
    subs = set_subscription(
        spark.createDataFrame([], SUBS_SCHEMA),
        spark.createDataFrame([(7, "odds", t0), (7, "odds", t0)], SUBS_SCHEMA),
    )
    assert subs.count() == 1
