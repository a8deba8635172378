"""Job-queue semantics (SURVEY.md §2.10 T2-T4): event-time
scheduling, late-data expiry, retention GC — batch functions that a
Structured Streaming ``foreachBatch`` can call verbatim.

The reference's queue is a git-committed ``jobs.json`` rewritten per
cron tick (.github/workflows/football-data-pipeline.yml:186-256).
Here the queue is a DataFrame; each tick is one deterministic
transform parameterized by ``now`` (never wall clock inside the
plan — replays are reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: collection schedule per fixture priority — offsets in hours before
#: kickoff (yml:190-210)
SCHEDULES = {
    "highest": (("early_odds", 48), ("pre_match", 12), ("team_news", 3), ("final_data", 1)),
    "high": (("early_odds", 24), ("pre_match", 12), ("team_news", 3), ("final_data", 1)),
    "default": (("early_odds", 24), ("pre_match", 12), ("team_news", 3), ("final_data", 1)),
}

EXPIRY_MINUTES = 45  # yml:420-424
PENDING_GRACE_HOURS = 2  # yml:241-246
DONE_RETENTION_DAYS = 3


def synthesize_jobs(fixtures: DataFrame, now: Column) -> DataFrame:
    """T2: fan each upcoming fixture out to its scheduled collection
    jobs (yml:186-227). fixtures: (fixture_id long, kickoff_utc
    timestamp, priority string). Only future jobs are emitted.
    """
    specs = []
    for prio, sched in SCHEDULES.items():
        for jtype, offset in sched:
            specs.append(F.struct(F.lit(prio).alias("p"), F.lit(jtype).alias("t"), F.lit(offset).alias("h")))
    spec_col = F.filter(
        F.array(*specs),
        lambda s: s["p"]
        == F.when(F.col("priority").isin("highest", "high"), F.col("priority")).otherwise(
            "default"
        ),
    )
    exploded = fixtures.select(
        "fixture_id", "kickoff_utc", "priority", F.explode(spec_col).alias("s")
    )
    scheduled_for = F.col("kickoff_utc") - (F.col("s.h") * F.expr("INTERVAL 1 HOUR"))
    return (
        exploded.withColumn("scheduled_for", scheduled_for)
        .filter(F.col("scheduled_for") > now)
        .select(
            F.concat_ws("_", F.col("fixture_id"), F.col("s.t")).alias("id"),
            "fixture_id",
            "scheduled_for",
            F.lit("pending").alias("status"),
            F.col("s.t").alias("type"),
            F.col("priority"),
            now.alias("created_at"),
        )
    )


def gc_jobs(existing: DataFrame, now: Column) -> DataFrame:
    """T4: retention — pending kept 2 h past due; completed/failed
    kept 3 days (yml:237-246)."""
    pending_ok = (F.col("status") == "pending") & (
        F.col("scheduled_for") > now - F.expr(f"INTERVAL {PENDING_GRACE_HOURS} HOURS")
    )
    done_ok = F.col("status").isin("completed", "failed") & (
        F.col("scheduled_for") > now - F.expr(f"INTERVAL {DONE_RETENTION_DAYS} DAYS")
    )
    return existing.filter(pending_ok | done_ok)


def merge_jobs(existing: DataFrame, new: DataFrame, now: Column) -> DataFrame:
    """O6/J7: GC the old queue, then append only genuinely new job
    ids (anti-join; yml:248-251)."""
    active = gc_jobs(existing, now)
    fresh = new.join(active.select("id"), on="id", how="left_anti")
    return active.unionByName(fresh)


def mark_expired(jobs: DataFrame, now: Column) -> DataFrame:
    """T3: the 45-minute late-data rule (yml:420-424) — the batch
    analogue of a watermark: due-but-stale pending jobs flip to
    'expired' and are dropped from processing."""
    return jobs.withColumn(
        "status",
        F.when(
            (F.col("status") == "pending")
            & (F.col("scheduled_for") < now - F.expr(f"INTERVAL {EXPIRY_MINUTES} MINUTES")),
            F.lit("expired"),
        ).otherwise(F.col("status")),
    )


def due_jobs(jobs: DataFrame, now: Column) -> DataFrame:
    """Jobs to process this tick: pending, due, not expired."""
    statused = mark_expired(jobs, now)
    return statused.filter(
        (F.col("status") == "pending") & (F.col("scheduled_for") <= now)
    )
