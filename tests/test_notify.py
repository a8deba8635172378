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
