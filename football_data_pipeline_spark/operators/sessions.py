"""Gap-based sessionization over the event stream.

The reference's job queue groups collection work by fixture and
time-proximity (collection runs cluster around kickoff —
`.github/workflows/football-data-pipeline.yml:217-256`); the general
form of that grouping is sessionization: split each user's event
sequence wherever the gap to the previous event exceeds a threshold,
then aggregate per session. It is also a staple of training-data
pipelines over behavioral/log corpora (conversation threading,
interaction-session assembly for RL trajectories).

Semantics (the canonical LAG + running-sum formulation):
  new_session = (ts − lag(ts) > GAP) OR first event of the user
  session_idx = running count of new_session flags up to this row
Every downstream per-session aggregate is then an ordinary grouped
aggregation on (user_id, session_idx).

Scale shape: ONE shuffle on user_id feeds both windows (lag and
running sum share the identical partition+order spec, so Catalyst
plans them in a single WindowExec pass) and the per-session
aggregation that follows is partition-local until the final
user-level rollup — which re-uses the same user_id hash
partitioning, so AQE coalesces rather than reshuffles. Per-user
partitions are user-activity-sized (bounded by retention windows in
practice), the same skew profile every session-assembly system
carries; a hot key would take the salt-then-merge treatment
documented in dedup.py. Durations are integer microseconds
end-to-end (unix_micros), summed exactly — no float timestamps
anywhere, so results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import rnd
from ..registry import query

#: session gap threshold, seconds (4 h — sized so the synthetic
#: events corpus, ~11 h mean inter-event gap per user, yields a
#: healthy mix of singleton and multi-event sessions)
SESSION_GAP_S = 4 * 3600


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """One row per (user_id, session_idx): start/end instants, event
    count, distinct event types, and integer-µs duration. See the
    module docstring for semantics and the one-shuffle plan shape."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.lit(gap_s).cast("long") * 1_000_000
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - prev > gap_us), 1
    ).otherwise(0)
    return (
        events.withColumn("session_idx", F.sum(new_session).over(run))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").alias("n_event_types"),
            (
                F.max(F.unix_micros(F.col("ts")))
                - F.min(F.unix_micros(F.col("ts")))
            ).alias("duration_us"),
        )
    )


def _sessions_oracle() -> str:
    return f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > CAST({SESSION_GAP_S} AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_idx,
             count(*) AS n_events,
             max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
      FROM numbered GROUP BY user_id, session_idx
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(sum(CASE WHEN n_events > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_sessions,
           floor(CAST(sum(dur_us) AS BIGINT) * 1.0 / (count(*) * 1000000.0)
                 * 1000 + 0.5) / 1000 AS avg_session_sec
    FROM sessions GROUP BY user_id
    """


@query("q_sessionize", oracle=_sessions_oracle())
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup over :func:`sessionize`: session count,
    event totals, and mean session duration (exact-µs integer sums,
    stable-rounded only at the final presentation divide)."""
    sessions = sessionize(load(spark, sf_dir, "events"))
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum(F.when(F.col("n_events") > 1, 1).otherwise(0)).alias(
            "n_multi_sessions"
        ),
        rnd(
            F.sum("duration_us").cast("double")
            / (F.count("*") * F.lit(1_000_000.0)),
            3,
        ).alias("avg_session_sec"),
    )
