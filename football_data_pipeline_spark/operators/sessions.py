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

Scale shape: ONE shuffle on user_id feeds both windows (the running
sum consumes the lag output, so Catalyst plans TWO WindowExec
operators — but they share the identical partition+order spec, so
one Exchange + one Sort feeds both; PLANS.md records exch=1, win=2)
and the per-session
aggregation that follows is partition-local until the final
user-level rollup — which re-uses the same user_id hash
partitioning, so AQE coalesces rather than reshuffles. Per-user
partitions are user-activity-sized (bounded by retention windows in
practice), the same skew profile every session-assembly system
carries; a hot key would take the salt-then-merge treatment
documented in dedup.py. Durations are integer microseconds
end-to-end (unix_micros), summed exactly — no float timestamps
anywhere, so results are partitioning-independent.

Measured on the 10× events probe (tools/scale_probe.py — 10× users,
constant per-user activity): q_sessionize 0.82s → 1.01s and
q_retention_cohorts 0.66s → 0.87s for 10× events — both
overhead-bound, confirming per-user state never crosses users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import dsum, oracle_dsum, rnd
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


# --- weekly retention cohorts ---


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_active, cohort_size,
    retention_rate): the classic cohort-retention matrix — users
    bucketed by their first active ISO week, then counted in every
    later week they return. The at-scale twin of the reference
    dashboard's per-day activity trend (streamlit_dashboard.py's
    date_trunc groupings), generalized to the per-entity lifecycle
    view every behavioral corpus audit needs.

    Plan shape: dedupe (user, week) pairs (one hash aggregate), a
    user-keyed min for the cohort assignment, one user-keyed join to
    attach it (both sides share the user_id hash partitioning — AQE
    keeps it local), then a cohort-keyed rollup whose input is
    |users|·|weeks| at most. No window, no cross product; every
    aggregate map-side combines. Week arithmetic is exact integer
    days/7 (both engines truncate weeks to Monday), so no float
    timestamps anywhere. The output cohort_week is a yyyy-MM-dd
    string — engines disagree on how a derived DATE round-trips
    (q_date_trunc_trend's documented convention).
    """
    uw = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
        )
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    joined = uw.join(cohort, "user_id").withColumn(
        "week_offset", (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int")
    )
    mat = joined.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return mat.join(sizes, "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        rnd(F.col("n_active") / F.col("cohort_size"), 4).alias("retention_rate"),
    )


def _retention_oracle() -> str:
    return """
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    cohort AS (
      SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id
    ),
    joined AS (
      SELECT u.user_id, c.cohort_week,
             CAST(date_diff('day', c.cohort_week, u.wk) / 7 AS INT) AS week_offset
      FROM uw u JOIN cohort c ON c.user_id = u.user_id
    ),
    mat AS (
      SELECT cohort_week, week_offset, count(*) AS n_active
      FROM joined GROUP BY cohort_week, week_offset
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY cohort_week
    )
    SELECT strftime(m.cohort_week, '%Y-%m-%d') AS cohort_week, m.week_offset,
           CAST(m.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           floor(m.n_active * 1.0 / s.cohort_size * 10000 + 0.5) / 10000
             AS retention_rate
    FROM mat m JOIN sizes s ON s.cohort_week = m.cohort_week
    """


@query("q_retention_cohorts", oracle=_retention_oracle())
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`retention_cohorts` over the events
    table (see that docstring for semantics and the plan shape)."""
    return retention_cohorts(load(spark, sf_dir, "events"))


# --- ordered-step funnel conversion ---

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """One-row funnel report: how many users completed each ordered
    step (their first step-k event must come strictly AFTER their
    first qualifying step-(k-1) event), plus step-over-step and
    end-to-end conversion rates. The ordered-sequence analysis the
    reference's phase-by-phase collection stats
    (streamlit_dashboard.py's per-phase rollups) point toward, and a
    standard behavioral-corpus audit.

    Plan shape: step 1 is a filtered user-keyed min; each later step
    filters the event scan to its type, joins the previous step's
    (user, first_ts) table on user_id — every join and aggregation
    keys on user_id, so AQE reuses one hash partitioning across the
    whole chain; each step's table only shrinks. No window, no self
    cross join. Final counts are three 1-row aggregates broadcast
    -combined into one row.
    """
    prev = None
    counts = []
    for i, step in enumerate(steps):
        cur = events.filter(F.col("event_type") == step).select(
            "user_id", F.col("ts").alias("__t")
        )
        if prev is None:
            reached = cur.groupBy("user_id").agg(F.min("__t").alias("first_ts"))
        else:
            reached = (
                cur.join(prev, "user_id")
                .filter(F.col("__t") > F.col("first_ts"))
                .groupBy("user_id")
                .agg(F.min("__t").alias("first_ts"))
            )
        counts.append(
            reached.agg(F.count("*").alias(f"n_{step}"))
        )
        prev = reached
    row = counts[0]
    for c in counts[1:]:
        row = row.crossJoin(F.broadcast(c))
    first, last = f"n_{steps[0]}", f"n_{steps[-1]}"
    out = row
    for a, b in zip(steps, steps[1:]):
        out = out.withColumn(
            f"rate_{b}", rnd(F.col(f"n_{b}") / F.col(f"n_{a}"), 4)
        )
    return out.withColumn(
        "rate_overall", rnd(F.col(last) / F.col(first), 4)
    )


def _funnel_oracle() -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
    WITH r1 AS (
      SELECT user_id, min(ts) AS first_ts FROM events
      WHERE event_type = '{s1}' GROUP BY user_id
    ),
    r2 AS (
      SELECT e.user_id, min(e.ts) AS first_ts
      FROM events e JOIN r1 ON r1.user_id = e.user_id
      WHERE e.event_type = '{s2}' AND e.ts > r1.first_ts
      GROUP BY e.user_id
    ),
    r3 AS (
      SELECT e.user_id, min(e.ts) AS first_ts
      FROM events e JOIN r2 ON r2.user_id = e.user_id
      WHERE e.event_type = '{s3}' AND e.ts > r2.first_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM r1) AS n_{s1},
           (SELECT count(*) FROM r2) AS n_{s2},
           (SELECT count(*) FROM r3) AS n_{s3},
           floor((SELECT count(*) FROM r2) * 1.0
                 / (SELECT count(*) FROM r1) * 10000 + 0.5) / 10000 AS rate_{s2},
           floor((SELECT count(*) FROM r3) * 1.0
                 / (SELECT count(*) FROM r2) * 10000 + 0.5) / 10000 AS rate_{s3},
           floor((SELECT count(*) FROM r3) * 1.0
                 / (SELECT count(*) FROM r1) * 10000 + 0.5) / 10000 AS rate_overall
    """


@query("q_funnel", oracle=_funnel_oracle())
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`funnel_counts` with the
    view → click → purchase funnel (see that docstring for semantics
    and the user-keyed join-chain plan shape)."""
    return funnel_counts(load(spark, sf_dir, "events"))


# --- multi-level ROLLUP activity report ---


@query(
    "q_rollup_report",
    oracle=f"""
    SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           coalesce(event_type, 'ALL') AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS total_value
    FROM events
    GROUP BY ROLLUP (strftime(date_trunc('day', ts), '%Y-%m-%d'), event_type)
    """,
)
def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily × event-type activity report WITH ROLLUP: detail rows,
    per-day subtotals, and the grand total in ONE aggregation pass —
    the multi-level form of the reference dashboard's separate
    per-day and per-phase groupings (streamlit_dashboard.py:154-162
    runs them as independent queries; ROLLUP computes the lattice in
    one shuffle with partial aggregation at every level).

    Subtotal rows surface the rolled-up key as the literal 'ALL'
    (neither source column is nullable here, so no ambiguity);
    value sums are decimal-exact at every level, so even the grand
    total is partitioning-independent.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "total_value",
        )
    )
