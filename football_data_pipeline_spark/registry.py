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
    # =========== ROUND 12 CURATION ===========
    # --- the r11 carry IOU heads the round (codified rule; VERDICT
    # r11 next-round item 2 — these 26 hold green r8 rows, modules
    # byte-untouched since, covered every round by the local
    # all-queries gate; they owe a FRESH driver row first):
    "q_scd2_history",
    "q_first_last_change",
    "q_validate_counts",
    "q_team_events",
    "q_lineups_flatten",
    "q_team_stats_extract",
    "q_minhash_error",
    "q_quality_classifier",
    "q_dataset_card",
    "q_semdedup",
    "q_pq_encode",
    "q_pq_recall",
    "q_hard_negatives",
    "q_learnability",
    "q_diverse_sample",
    "q_target_mixture",
    "q_epoch_order",
    "q_decontaminate",
    "q_pii_redact",
    "q_dsir_weights",
    "q_rollup_report",
    "q_repetition",
    "q_winnow_fingerprints",
    "q_containment",
    "q_moving_avg",
    "q_anomaly",
    # --- modules NEW or edited in r12 (the codified rule):
    # operators/retrieval.py: term-bucketed postings layout + pruned
    # read_index (VERDICT r11 item 1), zero-token presence rows in
    # build_postings/index_stats (ADVICE r11), merge_index doc-id
    # overlap guard (VERDICT r11 item 3), batch-oracle pair DISTINCT
    # (ADVICE r11) — all three retrieval queries re-check:
    "q_bm25_topk",
    "q_bm25_batch",
    "q_bm25_indexed",
    # ...and (r12, late) the index-DELETE fold, the retention/dedup
    # counterpart of the fold-in, and positional phrase search —
    # both NEW, so they must be checked:
    "q_bm25_index_delete",
    "q_phrase_search",
    "q_near_search",
    # operators/hybrid.py: q_hybrid_batch NEW (VERDICT r11 item 6 —
    # the serving-path composition: batch BM25 x IVF lists fused
    # keyed); the module byte-changed so q_hybrid_topk re-checks:
    "q_hybrid_topk",
    "q_hybrid_batch",
    # sources/snapshots.py: maintain() compaction commit inherits the
    # batch watermark (ADVICE r11) + snapshot_append_writer grew
    # partition_by (the bucketed-postings write path) — its queries
    # and every dependent module's re-check:
    "q_cow_delete",
    "q_merge_cow",
    "q_cow_update",
    "q_incremental_view",
    "q_mor_delete",
    "q_snapshot_diff",
    # streaming/supersede.py: unpersist guard (ADVICE r11) + the
    # snapshot-backed writer becomes the documented default
    # (VERDICT r11 item 4):
    "q_supersede",
    # streaming/pipeline.py + mediadedup.py (+ vectors.py, pytest
    # surface): funnel histories ported to the snapshot log
    # (VERDICT r11 item 4) — both media queries re-check:
    "q_media_dedup",
    "q_media_curation",
    # --- freshness: the 7 oldest r9-latest rows (modules
    # byte-untouched since r9; q_audio_near_dup, q_multimodal_meta
    # and q_pagerank yielded their slots to the late
    # q_bm25_index_delete / q_phrase_search / q_near_search above);
    # the remaining 39 r9-latest names carry to the r13 head
    # (CARRY_TO_NEXT_ROUND below):
    "q_video_frame_dedup",
    "q_video_stats",
    "q_learned_mapping",
    "q_fuzzy_join",
    "q_difflib_ratio",
    "q_resolve_alternatives",
    "q_normalize_names",
]

# --- r12 SHARED-DEP LEDGER -------------------------------------------
# Modules edited in r12 and their registered-query lineage:
# - operators/retrieval.py (bucketed layout, presence rows, merge
#   guard, oracle DISTINCT): q_bm25_topk/q_bm25_batch/q_bm25_indexed
#   IN HEAD.
# - operators/hybrid.py (q_hybrid_batch NEW; imports retrieval CTEs
#   + embedsearch's q_knn_ivf — embedsearch byte-untouched):
#   q_hybrid_topk + q_hybrid_batch IN HEAD.
# - sources/snapshots.py (maintain watermark carry, append-writer
#   partition_by): q_cow_delete/q_merge_cow/q_cow_update IN HEAD;
#   dependents sources/incremental.py (q_incremental_view), mor.py
#   (q_mor_delete), changelog.py (q_snapshot_diff), streaming/
#   supersede.py (q_supersede) IN HEAD.
# - sources/optimize.py (collision-safe working columns, ADVICE
#   r11): NO registered query (pytest: tests/test_optimize.py);
#   its query-bearing caller snapshots.py is IN HEAD.
# - streaming/pipeline.py, mediadedup.py, vectors.py (snapshot-log
#   unification): q_media_dedup + q_media_curation IN HEAD; the
#   substring-trim/vector funnels are pytest surfaces.
# - tools/gen_plans_md.py (q_skew_report k-bounded note), registry
#   curation lists, tests/*: no runtime query lineage.
# r12 LATE additions (each verified by a fresh full driver-sim at
# HEAD before its commit):
# - operators/retrieval.py also gained unmerge_index (index-DELETE
#   fold) + maintain_index (bucket-preserving housekeeping):
#   q_bm25_index_delete NEW IN HEAD (q_audio_near_dup yielded its
#   freshness slot and moved to CARRY).
# - sources/snapshots.py also gained rollback() (pointer-moving,
#   history-preserving): additive; its queries already IN HEAD.
# - sources/optimize.py gained compact_partitioned_log (the bucketed
#   logs' compactor): pytest surface (test_retrieval maintain test).
# - streaming/cdc_stream.py gained the snapshot-backed writer/reader/
#   fold: q_cdc_apply lives in operators/cdc.py (byte-untouched) and
#   keeps its green r10 row; the new surface is pytest-locked
#   (test_cdc_stream twin-run/replay/fold).
# Everything in ROTATE_TAIL holds a green r9, r10 or r11 driver row
# and its module + shared deps are untouched since that row. The
# r11 curation notes live in git history (this file at 695fba4).
CARRY_TO_NEXT_ROUND: list[str] = [
    # the r9-latest freshness refreshes the r12 head could not
    # fit — all 39 names below, i.e. the 36 remaining r9 rows plus
    # the 3 yielded-slot names folded in per the note above
    # (modules byte-untouched since r9, green rows stand; the
    # head spent 26 slots repaying the r11 carry IOU, 15 on touched
    # modules and the two new queries, 9 on the oldest r9 rows) —
    # head these in r13 (VERDICT r12 item 7: the count in prose must
    # match len() of this list, which the driver validates):
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
]
ROTATE_TAIL = [
    # green r11 driver rows (CORRECTNESS_r11.json), modules untouched
    # in r12:
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
    "q_ewma",
    "q_gopher_rules",
    "q_cube_report",
    "q_skew_report",
    "q_length_filter",
    "q_length_quantiles",
    "q_profile_documents",
    "q_k_anonymity",
    "q_team_form",
    "q_odds_flatten",
    "q_latest_per_key",
    "q_lag_movement",
    "q_upcoming_games",
    "q_upsert_latest",
    "q_lm_score",
    "q_fluency_buckets",
    "q_lm_bigram",
    "q_sessionize",
    "q_retention_cohorts",
    "q_funnel",
    "q_teams_extract",
    "q_league_teams",
    "q_json_extract",
    "q_h2h_flatten",
    "q_gopher_repetition",
    "q_bloom_skipping",
    "q_partition_prune",
    # green r10 driver rows, modules untouched in r11 AND r12:
    "q_media_gate",
    "q_dedup_best_of_group",
    "q_dedup_best_of_component",
    "q_release_drops",
    "q_release_drops_best",
    "q_knn_ivfpq",
    "q_pair_curation",
    "q_zorder_skipping",
    "q_drift_psi",
    "q_html_extract",
    "q_analyze_stats",
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
    # green r9 driver rows, modules untouched in r10, r11 AND r12
    # (the freshness remainder recorded in CARRY_TO_NEXT_ROUND
    # above):
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
