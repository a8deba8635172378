"""Gold report builders — the reference's JSON report documents
assembled from the engine's silver tables.

Three document shapes, matching the samples shipped with the
reference (/root/reference/data/weekly_report.json,
health_status.json, dashboard_data.json) and the builders in
.github/workflows/football-data-pipeline.yml (weekly report
:702-778, health check :482-612, dashboard data :829-929):

- ``weekly_report``: 7-day odds/games counts + top-leagues /
  bookmakers / collection-phase breakdowns, one nested document;
- ``health_status``: rule-derived status + issues/recommendations
  from the job queue and warehouse freshness;
- ``dashboard_data``: upcoming games (the gold view), 24 h odds
  movements, league stats, team performance, totals.

Shape notes for scale: every component first collapses to an
aggregate- or top-k-sized DataFrame (hash aggs, TakeOrderedAndProject
limits — the same plans as the standalone queries), and only those
dim-sized results are packed into arrays-of-structs. ``collect_list``
never sees a fact table, and array ordering is made deterministic by
``array_sort`` on an explicit (rank, tiebreak) key, never by
collection order. The single-row documents join via crossJoin of
1-row inputs (a no-op plan-wise). Documents land via
``write_report_json`` (sinks.py).

The reference computes everything relative to wall clock; here
``now`` is an explicit Column so replays are deterministic
(same convention as streaming/jobs.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stable import rnd
from .gold import upcoming_games_with_odds
from .windows import pct_change


def _packed_top(
    df: DataFrame,
    order_desc: Column,
    tiebreak: Column,
    payload: Column,
    k: int | None,
    alias: str,
) -> DataFrame:
    """Collapse an aggregate-sized DataFrame to ONE row holding the
    top-k payload structs in (order_desc DESC, tiebreak ASC) order.

    array_sort on a (negated rank, tiebreak, payload) struct makes the
    order engine-deterministic regardless of collect_list's partition
    order; the slice caps the array at k.
    """
    packed = df.agg(
        F.array_sort(
            F.collect_list(F.struct((-order_desc).alias("__o"), tiebreak.alias("__t"), payload.alias("p")))
        ).alias("__arr")
    )
    arr = F.transform("__arr", lambda s: s["p"])
    if k is not None:
        arr = F.slice(arr, 1, k)
    return packed.select(arr.alias(alias))


def weekly_report(
    odds_history: DataFrame,
    fixtures: DataFrame,
    leagues: DataFrame,
    now: Column,
) -> DataFrame:
    """The weekly report document (yml:702-778; sample
    /root/reference/data/weekly_report.json): one row =
    {report_date, period, summary{odds_collected, games_tracked,
    top_leagues[], bookmakers[], collection_phases[]}}.
    """
    week_ago = now - F.expr("INTERVAL 7 DAYS")
    # bounded on BOTH ends: with an explicit replay `now`, rows
    # collected after it exist in the warehouse and must not leak
    # into 'last_7_days' (the reference's wall-clock now makes the
    # upper bound implicit)
    recent = odds_history.filter(
        (F.col("collected_at") >= week_ago) & (F.col("collected_at") <= now)
    )

    counts = recent.agg(
        F.count("*").alias("odds_collected"),
        F.countDistinct("fixture_id").alias("games_tracked"),
    )
    lg = leagues.select(F.col("id").alias("__lg_id"), F.col("season").alias("__lg_season"), F.col("name"))
    per_league = (
        recent.join(
            fixtures.select(F.col("id").alias("fixture_id"), "league_id", "season"),
            "fixture_id",
        )
        .join(
            F.broadcast(lg),
            (F.col("league_id") == F.col("__lg_id")) & (F.col("season") == F.col("__lg_season")),
        )
        # GROUP BY l.id, l.name (yml) — two leagues sharing a name
        # (e.g. 'Primera Division' in two countries) stay separate
        .groupBy("__lg_id", "name")
        .agg(F.countDistinct("fixture_id").alias("games"))
    )
    top_leagues = _packed_top(
        per_league,
        F.col("games"),
        F.struct(F.col("name"), F.col("__lg_id")),
        F.struct("name", "games"),
        5,
        "top_leagues",
    )
    per_bookmaker = recent.groupBy(F.col("bookmaker").alias("name")).agg(
        F.count("*").alias("records")
    )
    bookmakers = _packed_top(
        per_bookmaker,
        F.col("records"),
        F.col("name"),
        F.struct("name", "records"),
        10,
        "bookmakers",
    )
    per_phase = recent.groupBy(F.col("collection_phase").alias("phase")).agg(
        F.count("*").alias("records")
    )
    phases = _packed_top(
        per_phase,
        F.col("records"),
        F.col("phase"),
        F.struct("phase", "records"),
        None,
        "collection_phases",
    )
    return (
        counts.crossJoin(top_leagues)
        .crossJoin(bookmakers)
        .crossJoin(phases)
        .select(
            F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss").alias("report_date"),
            F.lit("last_7_days").alias("period"),
            F.struct(
                "odds_collected",
                "games_tracked",
                "top_leagues",
                "bookmakers",
                "collection_phases",
            ).alias("summary"),
        )
    )


#: (issue text, recommendation text or None) per health rule, in the
#: reference's evaluation order (yml:499-553)
_HEALTH_RULES = (
    ("High job failure rate", None),
    ("Many expired jobs - possible scheduling issues", "Check API rate limits and processing capacity"),
    ("Large job backlog", "Consider increasing processing frequency"),
    ("No recent job activity", None),
    ("No recent odds data collected", None),
    ("No upcoming fixtures found", None),
)


def health_status(
    jobs: DataFrame,
    odds_history: DataFrame,
    fixtures: DataFrame,
    now: Column,
) -> DataFrame:
    """The health document (yml:482-612; sample
    /root/reference/data/health_status.json): one row =
    {timestamp, pipeline_status, issues[], recommendations[]}.

    Status rule replicated as the reference actually behaves: the
    final classification (``unhealthy`` if >3 issues, ``degraded`` if
    any, else ``healthy``) overrides the earlier per-rule status
    assignments — the shipped sample (3 issues incl. 'No recent job
    activity' → 'degraded') confirms the override. ``processed_at``
    is optional on the queue, as in jobs.json; absent ⇒ no job counts
    as recent (the reference defaults it to epoch).
    """
    day_ago = now - F.expr("INTERVAL 24 HOURS")
    processed = (
        F.col("processed_at") if "processed_at" in jobs.columns else F.lit(None).cast("timestamp")
    )
    # every counter is coalesced to 0: SUM over an EMPTY table is
    # NULL, which would make every rule condition NULL → no issues →
    # 'healthy' — a health check must fail CLOSED on a dead pipeline
    def czsum(cond):
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    job_counts = jobs.agg(
        czsum(F.col("status") == "pending").alias("n_pending"),
        czsum(F.col("status") == "failed").alias("n_failed"),
        czsum(F.col("status") == "expired").alias("n_expired"),
        czsum(F.col("status") == "completed").alias("n_completed"),
        czsum((processed >= day_ago) & (processed <= now)).alias("n_recent"),
    )
    odds_counts = odds_history.agg(
        czsum(
            (F.col("collected_at") >= day_ago) & (F.col("collected_at") <= now)
        ).alias("n_recent_odds")
    )
    fixture_counts = fixtures.agg(
        czsum(F.col("kickoff_utc") > now).alias("n_future")
    )
    doc = job_counts.crossJoin(odds_counts).crossJoin(fixture_counts)
    conds = [
        F.col("n_failed") > F.col("n_completed") * 0.2,
        F.col("n_expired") > 10,
        F.col("n_pending") > 50,
        F.col("n_recent") == 0,
        F.col("n_recent_odds") == 0,
        F.col("n_future") == 0,
    ]
    flagged = F.array(
        *[
            F.struct(
                cond.alias("hit"),
                F.lit(issue).alias("issue"),
                F.lit(rec).cast("string").alias("rec"),
            )
            for cond, (issue, rec) in zip(conds, _HEALTH_RULES)
        ]
    )
    hits = F.filter(flagged, lambda s: s["hit"])
    issues = F.transform(hits, lambda s: s["issue"])
    recommendations = F.filter(
        F.transform(hits, lambda s: s["rec"]), lambda r: r.isNotNull()
    )
    status = (
        F.when(F.size(issues) > 3, "unhealthy")
        .when(F.size(issues) > 0, "degraded")
        .otherwise("healthy")
    )
    return doc.select(
        F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        status.alias("pipeline_status"),
        issues.alias("issues"),
        recommendations.alias("recommendations"),
    )


def dashboard_data(
    fixtures: DataFrame,
    teams: DataFrame,
    leagues: DataFrame,
    odds_history: DataFrame,
    team_statistics: DataFrame,
    now: Column,
) -> DataFrame:
    """The dashboard document (yml:829-929; sample
    /root/reference/data/dashboard_data.json): one row =
    {upcoming_games[], odds_movements[], league_stats[], top_teams[],
    last_updated, stats{total_fixtures, total_odds_records,
    active_leagues}}.
    """
    from pyspark.sql import Window

    # upcoming games: the gold composition, next 48 h, top 20 by
    # kickoff — require_scheduled=False because the dashboard yml
    # query has NO status filter, unlike the schema view
    upcoming = (
        upcoming_games_with_odds(
            fixtures, teams, leagues, odds_history, now, require_scheduled=False
        )
        .filter(F.col("kickoff_utc") < now + F.expr("INTERVAL 48 HOURS"))
        .orderBy("kickoff_utc", "fixture_id")
        .limit(20)
    )
    upcoming_packed = _packed_top(
        upcoming,
        # cast-to-double keeps sub-second precision — unix_timestamp
        # truncates to seconds and could disagree with the limit-20
        # selection's full-precision ordering (same hazard the
        # movements block below documents)
        -F.col("kickoff_utc").cast("double"),  # ascending kickoff
        F.col("fixture_id"),
        F.struct(
            F.col("fixture_id").alias("id"),
            "kickoff_utc",
            "home_team",
            "away_team",
            "league",
            "country",
            "home_odds",
            "draw_odds",
            "away_odds",
            "bookmaker",
            F.col("odds_updated").alias("collected_at"),
        ),
        20,
        "upcoming_games",
    )
    # odds movements: LAG per (fixture, bookmaker) over the last 24 h
    # of h2h snapshots, >10% home or away move (W2 machinery)
    day_ago = now - F.expr("INTERVAL 24 HOURS")
    w = Window.partitionBy("fixture_id", "bookmaker").orderBy("collected_at")
    recent = (
        odds_history.filter(
            (F.col("collected_at") >= day_ago)
            & (F.col("collected_at") <= now)
            & (F.col("market_type") == "h2h")
        )
        .withColumn("prev_home", F.lag("home_odds").over(w))
        .withColumn("prev_away", F.lag("away_odds").over(w))
        .filter(
            F.col("prev_home").isNotNull()
            & (
                (F.abs(F.col("home_odds") - F.col("prev_home")) / F.col("prev_home") > 0.1)
                | (F.abs(F.col("away_odds") - F.col("prev_away")) / F.col("prev_away") > 0.1)
            )
        )
    )
    ht = teams.select(F.col("id").alias("__ht_id"), F.col("name").alias("home_team"))
    at = teams.select(F.col("id").alias("__at_id"), F.col("name").alias("away_team"))
    fx = fixtures.select(
        F.col("id").alias("fixture_id"), "home_team_id", "away_team_id", "kickoff_utc"
    )
    movements = (
        recent.join(fx, "fixture_id")
        .join(F.broadcast(ht), F.col("home_team_id") == F.col("__ht_id"))
        .join(F.broadcast(at), F.col("away_team_id") == F.col("__at_id"))
        .orderBy(F.desc("collected_at"), "fixture_id", "bookmaker")
        .limit(10)
    )
    movements_packed = _packed_top(
        movements,
        # cast("double") keeps sub-second precision so the packed order
        # matches the full-precision selection cut above (unix_timestamp
        # truncates to seconds and could reorder close snapshots)
        F.col("collected_at").cast("double"),
        F.struct(F.col("fixture_id"), F.col("bookmaker")),
        F.struct(
            "fixture_id",
            "bookmaker",
            "home_odds",
            "away_odds",
            "prev_home",
            "prev_away",
            rnd(pct_change(F.col("home_odds"), F.col("prev_home"))).alias("home_change_pct"),
            "collected_at",
            "kickoff_utc",
            "home_team",
            "away_team",
        ),
        10,
        "odds_movements",
    )
    # league stats over fixtures of the last 30 days
    month_ago = now - F.expr("INTERVAL 30 DAYS")
    lg = leagues.select(
        F.col("id").alias("__lg_id"), F.col("season").alias("__lg_season"), "name", "country"
    )
    fx30 = fixtures.filter(F.col("kickoff_utc") >= month_ago).select(
        F.col("id").alias("fixture_id"), "league_id", "season"
    )
    league_stats_df = (
        fx30.join(
            F.broadcast(lg),
            (F.col("league_id") == F.col("__lg_id")) & (F.col("season") == F.col("__lg_season")),
        )
        .join(
            odds_history.select("fixture_id").withColumn("__odds_row", F.lit(1)),
            "fixture_id",
            "left",
        )
        .groupBy("name", "country")
        .agg(
            F.countDistinct("fixture_id").alias("total_games"),
            # count a RIGHT-side marker, not the join key: the using-
            # key column comes from the left side and is never NULL,
            # so count(fixture_id) would count odds-less fixtures as
            # phantom odds records
            F.count("__odds_row").alias("odds_records"),
        )
    )
    league_stats_packed = _packed_top(
        league_stats_df,
        F.col("total_games"),
        F.col("name"),
        F.struct("name", "country", "total_games", "odds_records"),
        None,
        "league_stats",
    )
    # team performance: latest week of stats snapshots, ≥5 matches
    week_ago_d = F.to_date(now - F.expr("INTERVAL 7 DAYS"))
    tnm = teams.select(F.col("id").alias("__t_id"), F.col("name").alias("team_name"))
    lgn = leagues.select(
        F.col("id").alias("__l_id"), F.col("season").alias("__l_season"), F.col("name").alias("league")
    )
    top_teams_df = (
        team_statistics.filter(
            (F.to_date("collection_date") >= week_ago_d)
            & (F.to_date("collection_date") <= F.to_date(now))
            & (F.col("matches_played") >= 5)
        )
        .join(F.broadcast(tnm), F.col("team_id") == F.col("__t_id"))
        .join(
            F.broadcast(lgn),
            (F.col("league_id") == F.col("__l_id")) & (F.col("season") == F.col("__l_season")),
        )
        .orderBy(F.desc("win_percentage"), "team_id", F.desc("collection_date"))
        .limit(20)
    )
    top_teams_packed = _packed_top(
        top_teams_df,
        F.col("win_percentage"),
        # negated date: the packed array's ascending struct sort must
        # agree with the selection's (team_id, collection_date DESC)
        F.struct(
            F.col("team_id"),
            (-F.unix_timestamp(F.col("collection_date").cast("timestamp"))).alias(
                "__nd"
            ),
        ),
        F.struct(
            F.col("team_name").alias("name"),
            "win_percentage",
            "goals_for",
            "goals_against",
            "matches_played",
            "league",
        ),
        20,
        "top_teams",
    )
    totals = fixtures.agg(F.count("*").alias("total_fixtures")).crossJoin(
        odds_history.agg(F.count("*").alias("total_odds_records"))
    )
    return (
        upcoming_packed.crossJoin(movements_packed)
        .crossJoin(league_stats_packed)
        .crossJoin(top_teams_packed)
        .crossJoin(totals)
        .select(
            "upcoming_games",
            "odds_movements",
            "league_stats",
            "top_teams",
            F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss").alias("last_updated"),
            F.struct(
                "total_fixtures",
                "total_odds_records",
                F.size("league_stats").alias("active_leagues"),
            ).alias("stats"),
        )
    )


#: expected per-table row-count ranges after 24 h of collection
#: (/root/reference/validate_data.py:69-73)
EXPECTED_RANGES = {
    "fixtures": (10, 30),
    "odds": (30, 100),
    "teams": (20, 60),
    "leagues": (5, 10),
}


def validate_counts(
    fixtures: DataFrame,
    odds_history: DataFrame,
    teams: DataFrame,
    leagues: DataFrame,
    now: Column,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """The data-validation report (/root/reference/validate_data.py:
    20-73): one row per warehouse table with its row count, the
    expected range, an in-range verdict, the latest relevant
    timestamp, and a 24 h freshness verdict.

    The reference prints counts and checks them by eye against the
    "Expected Values nach 24h" table; here the range check is a
    first-class boolean so a scheduler can alert on it. Freshness
    generalizes the reference's MAX(collected_at) print (:37-45) to
    every table via its natural timestamp, and fails CLOSED: an empty
    table has NULL latest_ts ⇒ is_fresh=false (the reference prints
    'Tabelle leer').

    Scale shape: each table collapses to a single-row hash agg
    (count + max — both map-side partial, no shuffle of row data),
    then a 4-row union. Nothing here grows with table size.
    """
    ranges = ranges or EXPECTED_RANGES
    day_ago = now - F.expr("INTERVAL 24 HOURS")
    specs = [
        ("fixtures", fixtures, "created_at"),
        ("odds", odds_history, "collected_at"),
        ("teams", teams, "updated_at"),
        ("leagues", leagues, "created_at"),
    ]
    parts = []
    for name, df, ts_col in specs:
        lo, hi = ranges[name]
        agg = df.agg(
            F.count("*").alias("row_count"), F.max(ts_col).alias("latest_ts")
        )
        parts.append(
            agg.select(
                F.lit(name).alias("table_name"),
                "row_count",
                F.lit(lo).cast("long").alias("expected_min"),
                F.lit(hi).cast("long").alias("expected_max"),
                ((F.col("row_count") >= lo) & (F.col("row_count") <= hi)).alias(
                    "in_range"
                ),
                "latest_ts",
                F.coalesce(
                    (F.col("latest_ts") >= day_ago) & (F.col("latest_ts") <= now),
                    F.lit(False),
                ).alias("is_fresh"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: estimated API calls per completed job type (yml:962-987)
API_COST = {"early_odds": 2, "pre_match": 4, "team_news": 1, "final_data": 2}
API_FOOTBALL_DAILY_LIMIT = 100


def api_usage_report(jobs: DataFrame, now: Column) -> DataFrame:
    """The API-usage document (yml:949-1027; sample
    /root/reference/data/api_usage.json): completed-job counts from
    the last 24 h weighted by the per-type call-cost model (A11),
    plus the traffic-light budget status."""
    day_ago = now - F.expr("INTERVAL 1 DAY")
    processed = (
        F.col("processed_at") if "processed_at" in jobs.columns else F.lit(None).cast("timestamp")
    )
    done = jobs.filter(
        (F.col("status") == "completed") & (processed >= day_ago) & (processed <= now)
    )
    cost = F.lit(1)
    for t, c in API_COST.items():
        cost = F.when(F.col("type") == t, c).otherwise(cost)
    af_cost = F.when(F.col("type").isin("pre_match", "final_data"), 3).otherwise(1)
    agg = done.agg(
        F.count("*").alias("completed_jobs"),
        F.coalesce(F.sum(cost), F.lit(0)).alias("estimated_total_calls"),
        F.coalesce(F.sum(af_cost), F.lit(0)).alias("api_football_calls"),
        F.count("*").alias("odds_api_calls"),  # 1 call per job
    )
    remaining = F.greatest(
        F.lit(0), F.lit(API_FOOTBALL_DAILY_LIMIT) - F.col("api_football_calls")
    )
    status = (
        F.when(F.col("api_football_calls") < 80, "green")
        .when(F.col("api_football_calls") < 95, "yellow")
        .otherwise("red")
    )
    return agg.select(
        F.date_format(now, "yyyy-MM-dd").alias("date"),
        "completed_jobs",
        "estimated_total_calls",
        "api_football_calls",
        "odds_api_calls",
        remaining.alias("api_football_remaining"),
        status.alias("usage_status"),
    )


def mapping_stats_report(
    attempts: DataFrame,
    learned_count: DataFrame,
    manual_count: DataFrame,
    now: Column,
) -> DataFrame:
    """The daily mapping-stats document (sample
    /root/reference/data/daily_mapping_stats.json): in-memory run
    stats (enhanced_mapping.py:267-288) plus the periodic report
    (:661-708). ``attempts`` is attempt_log's output; the two count
    inputs are the mapping dims."""
    succ_conf = F.when(F.col("success"), F.col("confidence"))
    overall = attempts.agg(
        F.count("*").alias("total_attempts"),
        F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("successful_mappings"),
        F.sum(F.when(F.col("success"), 0).otherwise(1)).alias("failed_mappings"),
        # `avg_conf or 0.0` in the reference — a run with zero
        # successes reports 0.0, not null (enhanced_mapping.py:295)
        F.coalesce(F.avg(succ_conf), F.lit(0.0)).alias("avg_confidence"),
    ).withColumn(
        "success_rate",
        F.when(
            F.col("total_attempts") > 0,
            F.col("successful_mappings") / F.col("total_attempts"),
        ).otherwise(F.lit(0.0)),
    )
    # successful attempts only — the reference's strategy_usage query
    # is `... WHERE success = 1 GROUP BY strategy_used`
    # (enhanced_mapping.py:283-288); counting failures would add a
    # 'no_match' key and inflate real strategies
    usage = (
        attempts.filter(F.col("success"))
        .groupBy("strategy")
        .agg(F.count("*").alias("n"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("strategy", "n")))
            ).alias("strategy_usage")
        )
    )
    # ALL attempts group per strategy (enhanced_mapping.py:684-697):
    # a strategy with attempts but zero successes appears with
    # success_rate 0.0 instead of vanishing; avg_confidence averages
    # successful attempts only, success_rate = successes/attempts
    per_strategy = attempts.groupBy("strategy").agg(
        F.count("*").alias("attempts"),
        F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("successes"),
        rnd(F.avg(F.when(F.col("success"), F.col("confidence"))), 4).alias(
            "avg_confidence"
        ),
    ).withColumn(
        "success_rate",
        rnd(F.col("successes") * 1.0 / F.col("attempts"), 4),
    )
    strategy_perf = _packed_top(
        per_strategy,
        F.col("successes"),
        F.col("strategy"),
        F.struct(
            "strategy", "attempts", "successes", "avg_confidence", "success_rate"
        ),
        None,
        "strategy_performance",
    )
    failed = _packed_top(
        attempts.filter(~F.col("success")).select("api_name"),
        F.lit(0),
        F.col("api_name"),
        F.struct("api_name"),
        20,
        "failed_list",  # renamed into the report struct below —
        # 'failed_mappings' also names the stats-level count
    )
    # ORDER BY attempted_at DESC in the reference (:721-722) —
    # recency, not confidence, picks the 10. attempt_log stamps
    # attempted_at when given `now`; a log without the column (older
    # callers) falls back to confidence order, documented here.
    recency = (
        F.col("attempted_at").cast("double")
        if "attempted_at" in attempts.columns
        else F.col("confidence")
    )
    successes = _packed_top(
        attempts.filter(F.col("success")),
        recency,
        F.col("api_name"),
        F.struct("api_name", "matched_name", "confidence"),
        10,
        "recent_successes",
    )
    counts = learned_count.agg(F.count("*").alias("learned_mappings_count")).crossJoin(
        manual_count.agg(F.count("*").alias("manual_mappings_count"))
    )
    return (
        overall.crossJoin(usage)
        .crossJoin(strategy_perf)
        .crossJoin(failed)
        .crossJoin(successes)
        .crossJoin(counts)
        .select(
            F.date_format(now, "yyyy-MM-dd").alias("date"),
            F.struct(
                "total_attempts",
                "successful_mappings",
                "failed_mappings",
                "success_rate",
                "avg_confidence",
                "strategy_usage",
            ).alias("stats"),
            F.struct(
                F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss").alias("report_date"),
                F.lit(1).alias("period_days"),
                F.struct(
                    "total_attempts",
                    "successful_mappings",
                    "success_rate",
                    "avg_confidence",
                ).alias("overall_stats"),
                F.col("strategy_performance"),
                F.col("failed_list").alias("failed_mappings"),
                F.col("recent_successes"),
                F.col("learned_mappings_count"),
                F.col("manual_mappings_count"),
            ).alias("report"),
        )
    )
