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
    # =========== ROUND 14 CURATION (optimization round 2) ===========
    # --- the 8 r13-touched names that never got a driver row in r13
    # (VERDICT r13 item 2: CHECK_PRIORITY was not rotated, so the CC
    # rewrite, pagerank checkpoint, repetition kernels and release
    # checkpoints rode on builder-side verification only) — they
    # lead the head; 6 of the 8 are ALSO r14-touched:
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_best_of_component",
    "q_pagerank",
    "q_gopher_repetition",
    "q_release_drops_best",
    "q_audio_near_dup",
    # --- modules touched in r14 (the codified rule: every query
    # whose module or shared dep changed in-round re-checks):
    # operators/dedup.py (CC rewrite: one-pass symmetrize, fused
    # lazy-checkpoint rounds, consecutive-propagated-sum convergence;
    # minhash split into rep_groups + verified_pairs) — all its
    # queries and every module importing it re-check:
    "q_dedup_exact",
    "q_line_dedup",
    "q_dedup_simhash",
    "q_source_overlap",
    "q_dedup_incremental",
    "q_leakage_split",
    "q_lsh_recall",
    "q_minhash_error",
    "q_dedup_best_of_group",
    # operators/resolution.py + er_queries.py (q_learned_mapping
    # batch 2 collapsed to a projection of batch 1; hard_fallback
    # seam removed):
    "q_normalize_names",
    "q_fuzzy_join",
    "q_learned_mapping",
    "q_difflib_ratio",
    "q_resolve_alternatives",
    # media kernel modules (video/audio/audiodedup/multimodal/
    # streaming-mediadedup: payload memos byte-gated via the new
    # functions/memo.py shared dep) and their composition dependents
    # (release.py, streaming/media.py, datacard.py, versioning.py,
    # streaming/supersede.py import dedup/multimodal/audio helpers):
    "q_video_frame_dedup",
    "q_video_stats",
    "q_audio_stats",
    "q_multimodal_meta",
    "q_media_curation",
    "q_media_dedup",
    "q_release_drops",
    "q_dataset_card",
    "q_corpus_diff",
    "q_media_gate",
    "q_supersede",
    # --- the r9-carry drain (VERDICT r13 item 2 / r12 item 2): the
    # oldest 17 of the 34 still-carried r9-latest names fit under the
    # cap this round; the remaining 17 stay in CARRY_TO_NEXT_ROUND:
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
]

# --- r14 SHARED-DEP LEDGER -------------------------------------------
# Modules edited in r14 and their registered-query lineage:
# - operators/dedup.py (connected_components rewrite + minhash
#   split): all 11 dedup.py queries IN HEAD; importers curation.py
#   (both queries IN HEAD), datacard.py (q_dataset_card IN HEAD),
#   versioning.py (q_corpus_diff IN HEAD), release.py (both IN
#   HEAD), streaming pipeline/supersede/vectors (q_supersede IN
#   HEAD; pipeline/vectors register no queries — pytest surfaces).
# - operators/resolution.py + er_queries.py (learned-mapping
#   projection; hard_fallback removal): all 5 er_queries IN HEAD.
# - functions/memo.py (NEW: byte-gated payload memo) + its users
#   video.py/audio.py/audiodedup.py/multimodal.py/
#   streaming/mediadedup.py: q_video_frame_dedup, q_video_stats,
#   q_audio_stats, q_audio_near_dup, q_multimodal_meta,
#   q_media_dedup, q_media_curation IN HEAD; dependent
#   streaming/media.py (q_media_gate IN HEAD).
# - bench.py (printed-line shrink, NOISY_QUERIES additions),
#   tools/capture_plans.py (round-dir parameter): harness only, no
#   query lineage.
# Everything in ROTATE_TAIL holds a green r9-r13 driver row and its
# module + shared deps are untouched since that row. The r13-head
# names rotated out this round (retrieval/lakehouse/streaming
# families, the r11-carry repayments) all hold green r13 rows
# (CORRECTNESS_r13.json) with modules untouched in r14.
CARRY_TO_NEXT_ROUND: list[str] = [
    # the r9-latest freshness refreshes the r14 head could not fit —
    # the 17 names below (of the 34 carried into this round; the
    # head drained the other 17 oldest plus the 5 that re-check via
    # touched modules: q_pagerank, q_multimodal_meta,
    # q_audio_near_dup, q_audio_stats, q_corpus_diff). Head these in
    # r15. _validate_curation() asserts this list's length against
    # _CARRY_DOCUMENTED_COUNT so the prose and the code cannot drift
    # (ADVICE r13).
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
    "q_salted_join",
]

#: the carry count the curation notes above document — validated
#: against len(CARRY_TO_NEXT_ROUND) so the comment cannot go stale
_CARRY_DOCUMENTED_COUNT = 17

ROTATE_TAIL = [
    # every query not in the r14 head (registration order): green
    # r9-r13 driver rows, modules + shared deps untouched in r14 —
    # see the shared-dep ledger above for the audit
    "q_analyze_stats",
    "q_bloom_skipping",
    "q_merge_cow",
    "q_cow_update",
    "q_cow_delete",
    "q_snapshot_diff",
    "q_incremental_view",
    "q_mor_delete",
    "q_partition_prune",
    "q_zorder_skipping",
    "q_stratified_sample",
    "q_holdout_split",
    "q_quality_sample",
    "q_quality_classifier",
    "q_windowed_volatility",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_chunking",
    "q_cdc_apply",
    "q_latest_per_key",
    "q_lag_movement",
    "q_first_last_change",
    "q_scd2_history",
    "q_teams_extract",
    "q_upcoming_games",
    "q_validate_counts",
    "q_team_odds_lookup",
    "q_odds_trends",
    "q_league_teams",
    "q_text_stats",
    "q_lang_id",
    "q_token_count",
    "q_doc_fingerprint",
    "q_repetition",
    "q_seq_histogram",
    "q_tfidf_terms",
    "q_winnow_fingerprints",
    "q_containment",
    "q_drift_psi",
    "q_knn_bruteforce",
    "q_dedup_embed",
    "q_knn_ivf",
    "q_knn_recall",
    "q_ivf_centroids",
    "q_ivf_reassign",
    "q_semantic_decontam",
    "q_json_extract",
    "q_upsert_latest",
    "q_odds_flatten",
    "q_lineups_flatten",
    "q_team_stats_extract",
    "q_h2h_flatten",
    "q_team_events",
    "q_html_extract",
    "q_team_form",
    "q_near_search",
    "q_phrase_search",
    "q_bm25_batch",
    "q_bm25_topk",
    "q_bm25_indexed",
    "q_bm25_index_delete",
    "q_hybrid_batch",
    "q_hybrid_topk",
    "q_semdedup",
    "q_pq_encode",
    "q_pq_recall",
    "q_knn_ivfpq",
    "q_lm_score",
    "q_fluency_buckets",
    "q_lm_bigram",
    "q_hard_negatives",
    "q_learnability",
    "q_diverse_sample",
    "q_target_mixture",
    "q_mixture_epochs",
    "q_temperature_sample",
    "q_epoch_order",
    "q_decontaminate",
    "q_pii_redact",
    "q_pair_curation",
    "q_k_anonymity",
    "q_profile_documents",
    "q_length_quantiles",
    "q_length_filter",
    "q_skew_report",
    "q_star_join",
    "q_team_search",
    "q_cube_report",
    "q_gopher_rules",
    "q_dsir_weights",
    "q_sessionize",
    "q_retention_cohorts",
    "q_funnel",
    "q_rollup_report",
    "q_salted_distinct",
    "q_salted_join",
    "q_heavy_hitters",
    "q_bloom_semi",
    "q_hll_audit",
    "q_quantile_audit",
    "q_corr_profile",
    "q_substring_dedup",
    "q_substring_strip",
    "q_exact_decontam",
    "q_source_substring_overlap",
    "q_before_after",
    "q_range_join",
    "q_weighted_sum",
    "q_kpi_ratio",
    "q_job_expiry",
    "q_asof_join",
    "q_moving_avg",
    "q_anomaly",
    "q_ewma",
    "q_weighted_sample",
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
    if len(CARRY_TO_NEXT_ROUND) != _CARRY_DOCUMENTED_COUNT:
        raise ValueError(
            f"CARRY_TO_NEXT_ROUND has {len(CARRY_TO_NEXT_ROUND)} names but the "
            f"curation notes document {_CARRY_DOCUMENTED_COUNT} — update both"
        )
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
