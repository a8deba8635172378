"""Streaming layer tests (T1-T5): job scheduling/expiry semantics
and the stateful movement-alert operator, driven end-to-end through
Structured Streaming with a memory sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.catalog import load
from football_data_pipeline_spark.streaming.jobs import (
    due_jobs,
    gc_jobs,
    mark_expired,
    merge_jobs,
    synthesize_jobs,
)
from football_data_pipeline_spark.streaming.movement import movement_alerts

from .conftest import SF_DIR

import pytest as _pytest_r14

# r14 slow tier: multi-minute e2e file — excluded from the default
# (driver-window) run by pytest.ini; the full suite (-m "") runs it.
pytestmark = _pytest_r14.mark.slow

def _now():
    return F.to_timestamp(F.lit("2024-03-01 12:00:00"))


def _fixtures(spark):
    return spark.createDataFrame(
        [
            (1, "2024-03-03 15:00:00", "highest"),
            (2, "2024-03-03 15:00:00", "high"),
            (3, "2024-03-01 13:00:00", "medium"),  # only 1h-offset job still future
            (4, "2024-02-01 15:00:00", "highest"),  # fully past → no jobs
        ],
        "fixture_id long, kickoff string, priority string",
    ).withColumn("kickoff_utc", F.to_timestamp("kickoff"))


def test_synthesize_jobs_offsets_and_future_filter(spark):
    jobs = synthesize_jobs(_fixtures(spark), _now()).collect()
    by_fixture = {}
    for j in jobs:
        by_fixture.setdefault(j.fixture_id, []).append(j)
    # highest: 48h offset (Mar 1 15:00) + 12/3/1 → all 4 future
    assert len(by_fixture[1]) == 4
    assert {j.type for j in by_fixture[1]} == {"early_odds", "pre_match", "team_news", "final_data"}
    # high: 24h early_odds → Mar 2 15:00, all 4 future
    assert len(by_fixture[2]) == 4
    # medium kickoff 13:00 today: only final_data (kickoff-1h = 12:00) is NOT > now → 0? 12:00 == now → excluded (strict >)
    assert 3 not in by_fixture
    assert 4 not in by_fixture
    assert all(j.status == "pending" for j in jobs)
    assert all(j.id == f"{j.fixture_id}_{j.type}" for j in jobs)


def test_expiry_and_due(spark):
    jobs = spark.createDataFrame(
        [
            ("a", "2024-03-01 11:00:00", "pending"),   # 60 min late → expired
            ("b", "2024-03-01 11:30:00", "pending"),   # 30 min late → due
            ("c", "2024-03-01 13:00:00", "pending"),   # future → not due
            ("d", "2024-03-01 10:00:00", "completed"), # untouched
        ],
        "id string, sched string, status string",
    ).withColumn("scheduled_for", F.to_timestamp("sched"))
    statused = {r.id: r.status for r in mark_expired(jobs, _now()).collect()}
    assert statused == {"a": "expired", "b": "pending", "c": "pending", "d": "completed"}
    assert {r.id for r in due_jobs(jobs, _now()).collect()} == {"b"}


def test_gc_and_merge(spark):
    existing = spark.createDataFrame(
        [
            ("1_early_odds", "2024-03-01 09:00:00", "pending"),    # 3h past grace → dropped
            ("2_early_odds", "2024-03-01 11:00:00", "pending"),    # within 2h grace → kept
            ("3_final_data", "2024-02-25 00:00:00", "completed"),  # >3d → dropped
            ("4_final_data", "2024-02-29 12:00:00", "failed"),     # <3d → kept
        ],
        "id string, sched string, status string",
    ).withColumn("scheduled_for", F.to_timestamp("sched")).drop("sched")
    new = spark.createDataFrame(
        [
            ("2_early_odds", "2024-03-02 11:00:00", "pending"),  # id clash → ignored
            ("9_team_news", "2024-03-02 09:00:00", "pending"),   # new → added
        ],
        "id string, sched string, status string",
    ).withColumn("scheduled_for", F.to_timestamp("sched")).drop("sched")
    merged = {r.id: r for r in merge_jobs(existing, new, _now()).collect()}
    assert set(merged) == {"2_early_odds", "4_final_data", "9_team_news"}
    # clash kept the EXISTING row (anti-join drops the new one)
    assert str(merged["2_early_odds"].scheduled_for) == "2024-03-01 11:00:00"


def test_movement_alerts_matches_lag_query(spark, tmp_path):
    """The stateful streaming operator must agree with the batch LAG
    query (W2) on the same data. (applyInPandasWithState only exists
    on streaming DataFrames, so only the stream path runs here.)"""
    mode = "stream"
    events = load(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    expected = (
        events.withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("prev_value").isNotNull() & (F.col("prev_value") != 0))
        .filter(F.abs((F.col("value") - F.col("prev_value")) / F.col("prev_value")) > 0.10)
        .count()
    )

    if mode == "batch":
        got = movement_alerts(events).count()
    else:
        import time

        src = str(tmp_path / "events_src")
        # two chronological arrivals (distinct mtimes → deterministic
        # file order) so cross-batch state carry-over is exercised
        # under the operator's in-order-arrival contract
        cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
        events.filter(F.col("ts") < cutoff).coalesce(1).write.parquet(src)
        time.sleep(1.1)
        events.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "1").parquet(src)
        )
        q = (
            movement_alerts(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("alerts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT count(*) FROM alerts").first()[0]
    assert got == expected


def test_windowed_volatility_stream_matches_batch(spark, tmp_path):
    """The watermarked tumbling-window aggregation must converge to
    the batch answer once the stream is drained (availableNow drains
    everything, and final windows flush on completion)."""
    import time

    from football_data_pipeline_spark.streaming.windowed import hourly_volatility

    events = load(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")
    expected = sorted(
        tuple(r) for r in hourly_volatility(events).collect()
    )

    src = str(tmp_path / "vol_src")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events.filter(F.col("ts") < cutoff).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    events.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        hourly_volatility(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("volatility")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM volatility").collect())
    assert got == expected


def test_stream_stream_interval_join(spark, tmp_path):
    """Both sides streaming with watermarks + an event-time range
    predicate: the odds snapshot joins the fixture created before it
    (within lookback); a fixture created AFTER the snapshot or
    beyond lookback does not match."""
    import time

    from football_data_pipeline_spark.streaming.windowed import enrich_stream_stream

    fx_schema = (
        "id long, kickoff_utc timestamp, home_team_id long, away_team_id long, "
        "created_at timestamp"
    )
    od_schema = (
        "fixture_id long, bookmaker string, home_odds double, draw_odds double, "
        "away_odds double, collected_at timestamp"
    )
    fx_dir, od_dir = str(tmp_path / "fx"), str(tmp_path / "od")
    spark.createDataFrame(
        [
            (1, "1995-06-02 15:00:00", 10, 11, "1995-06-01 00:00:00"),  # matches
            (2, "1995-06-02 15:00:00", 10, 11, "1995-06-01 13:00:00"),  # created after snapshot
            (3, "1995-06-02 15:00:00", 10, 11, "1995-05-30 00:00:00"),  # beyond 24h lookback
        ],
        "id long, k string, home_team_id long, away_team_id long, c string",
    ).selectExpr(
        "id", "CAST(k AS TIMESTAMP) kickoff_utc", "home_team_id",
        "away_team_id", "CAST(c AS TIMESTAMP) created_at",
    ).coalesce(1).write.parquet(fx_dir)
    spark.createDataFrame(
        [
            (1, "Alpha", 2.0, 3.0, 4.0, "1995-06-01 12:00:00"),
            (2, "Alpha", 2.0, 3.0, 4.0, "1995-06-01 12:00:00"),
            (3, "Alpha", 2.0, 3.0, 4.0, "1995-06-01 12:00:00"),
        ],
        "fixture_id long, bookmaker string, home_odds double, draw_odds double, "
        "away_odds double, c string",
    ).selectExpr(
        "fixture_id", "bookmaker", "home_odds", "draw_odds", "away_odds",
        "CAST(c AS TIMESTAMP) collected_at",
    ).coalesce(1).write.parquet(od_dir)

    odds = spark.readStream.schema(od_schema).parquet(od_dir)
    fixtures = spark.readStream.schema(fx_schema).parquet(fx_dir)
    q = (
        enrich_stream_stream(odds, fixtures)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT fixture_id FROM enriched").collect()
    assert [r.fixture_id for r in got] == [1]

    # batch parity: the same function on batch inputs gives the same match
    b = enrich_stream_stream(
        spark.read.parquet(od_dir), spark.read.parquet(fx_dir)
    ).collect()
    assert [r.fixture_id for r in b] == [1]
    assert b[0].home_team_id == 10


def test_user_sessions_stream_matches_batch_and_lag_form(spark, tmp_path):
    """The native session_window operator must (a) agree with the
    batch LAG+running-sum sessionize on the same events — membership,
    bounds, and duration — and (b) converge to the identical answer
    when driven as a stream (watermarked state, availableNow drain)."""
    import time

    from football_data_pipeline_spark.operators.sessions import sessionize
    from football_data_pipeline_spark.streaming.windowed import user_sessions

    events = load(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )

    proj = ["user_id", "session_start", "session_end", "n_events", "duration_us"]
    lag_form = sorted(
        tuple(r) for r in sessionize(events).select(*proj).collect()
    )
    batch = sorted(tuple(r) for r in user_sessions(events).collect())
    assert batch == lag_form

    src = str(tmp_path / "sess_src")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events.filter(F.col("ts") < cutoff).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    events.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        user_sessions(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_sw")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM sessions_sw").collect())
    assert got == batch


def test_user_sessions_append_mode_emits_closed_sessions_only(spark, tmp_path):
    """Append mode is the production mode for unbounded streams:
    a session row is emitted exactly once, when the watermark passes
    its close — sessions still open at the final watermark stay in
    state. Every emitted row must be byte-identical to the batch
    answer's row, and the emitted set must be exactly the batch
    sessions whose end precedes the final watermark."""
    import time

    from football_data_pipeline_spark.streaming.windowed import WATERMARK, user_sessions

    events = load(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    batch = {
        (r.user_id, r.session_start): tuple(r)
        for r in user_sessions(events).collect()
    }

    src = str(tmp_path / "sess_append_src")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events.filter(F.col("ts") < cutoff).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    events.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        user_sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): tuple(r)
        for r in spark.sql("SELECT * FROM sessions_append").collect()
    }
    assert 0 < len(got) <= len(batch)
    for k, row in got.items():
        assert batch[k] == row, k
    # the final watermark = max event time - delay; the emitted set
    # is exactly the batch sessions whose close (end + trailing gap)
    # precedes it. Spark truncates the watermark to milliseconds and
    # its boundary comparator is an implementation detail, so pin the
    # frontier as a band: strictly-before-the-floored-watermark
    # sessions MUST be emitted, and nothing at-or-after the raw
    # watermark may be.
    import datetime as dt

    from football_data_pipeline_spark.operators.sessions import SESSION_GAP_S

    max_ts = max(r[2] for r in batch.values())  # session_end column
    h, m, *_ = WATERMARK.split()
    delay = dt.timedelta(minutes=int(h)) if m.startswith("minute") else dt.timedelta(hours=int(h))
    wm_raw = max_ts - delay
    wm_floor = wm_raw.replace(microsecond=wm_raw.microsecond // 1000 * 1000)
    gap = dt.timedelta(seconds=SESSION_GAP_S)
    must_emit = {k for k, r in batch.items() if r[2] + gap < wm_floor}
    may_emit = {k for k, r in batch.items() if r[2] + gap <= wm_raw}
    assert must_emit <= set(got) <= may_emit
