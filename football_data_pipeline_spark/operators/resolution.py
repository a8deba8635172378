"""F12-F14: the 7-strategy entity-resolution cascade, set-oriented.

The reference resolves one name at a time with per-row early exit
(/root/reference/enhanced_mapping.py:325-392): try exact (conf 1.0),
manual table (0.95), learned table (0.9), normalized equality (0.85),
substring (≥0.75), word-Jaccard (≥0.7), fuzzy ratio (≥0.6), else fall
back to the fuzzy attempt (match if conf ≥ 0.3).

Spark re-architecture — one pass over (api × candidate) pairs,
no per-row control flow:
1. pair generation: broadcast the candidate universe (the reference
   prunes it to ≤~40 names per league, enhanced_mapping.py:846-851 —
   the blocking key keeps this tiny at any scale);
2. score every strategy's confidence per pair (all built-ins);
3. early-exit becomes: per api name, the chosen strategy is the FIRST
   (by priority) whose best-over-candidates confidence clears its
   threshold. Computed with two window expressions over the same
   partitioning (one shuffle): min passing strategy index, then
   row_number over (chosen-strategy confidence desc, name asc).

Determinism note: the reference breaks confidence ties by candidate
list order; this engine uses candidate name ascending — deterministic
under any partitioning, which list order is not (documented
divergence, encoded in the oracle).

Learning (F13) runs between batches, not within one — the reference
learns row-N's mapping in time for row-N+1; a set-oriented pass
converges after one extra batch (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import normalize_name
from ..functions.stable import rnd
from ..functions.similarity import (
    difflib_ratio,
    jaccard_words,
    levenshtein_ratio,
    substring_confidence,
)
from .upsert import upsert_replace

#: (index, strategy name, early-exit threshold) — enhanced_mapping.py:340-392
STRATEGIES = (
    (1, "exact_match", 1.0),
    (2, "manual_mapping", 0.95),
    (3, "learned_mapping", 0.9),
    (4, "normalized_matching", 0.85),
    (5, "substring_matching", 0.75),
    (6, "word_based_matching", 0.7),
    (7, "fuzzy_matching", 0.6),
    # fallback: the fuzzy attempt is returned anyway; it counts as a
    # match at conf ≥ 0.3 (enhanced_mapping.py:594-601)
    (8, "fuzzy_matching", 0.3),
)


def score_pairs(
    pairs: DataFrame,
    api_col: str = "api_name",
    cand_col: str = "odds_name",
    manual_col: str | None = None,
    learned_col: str | None = None,
    use_difflib: bool = False,
) -> DataFrame:
    """Add normalized names + per-strategy confidence columns to an
    (api, candidate) pair DataFrame.

    ``manual_col``/``learned_col`` are optional columns carrying the
    manual/learned target name for the api side (joined in by the
    caller from the mapping dims, F7)."""
    api, cand = F.col(api_col), F.col(cand_col)
    out = pairs.withColumn("__api_norm", normalize_name(api)).withColumn(
        "__cand_norm", normalize_name(cand)
    )
    an, cn = F.col("__api_norm"), F.col("__cand_norm")
    fuzzy_sim = (
        difflib_ratio(an, cn) if use_difflib else levenshtein_ratio(an, cn)
    )
    conf = {
        1: F.when(api == cand, 1.0).otherwise(0.0),
        2: (
            F.when(cand == F.col(manual_col), 0.95).otherwise(0.0)
            if manual_col
            else F.lit(0.0)
        ),
        3: (
            F.when(cand == F.col(learned_col), 0.9).otherwise(0.0)
            if learned_col
            else F.lit(0.0)
        ),
        4: F.when(an == cn, 0.85).otherwise(0.0),
        5: substring_confidence(an, cn),
        6: jaccard_words(an, cn),
        # fuzzy: similarity must clear 0.4 before scaling ×0.6
        # (enhanced_mapping.py:580-583)
        7: F.when(fuzzy_sim > 0.4, fuzzy_sim * 0.6).otherwise(0.0),
    }
    for idx, _, _ in STRATEGIES[:7]:
        out = out.withColumn(f"__conf_{idx}", conf[idx].cast("double"))
    return out.withColumn("__conf_8", F.col("__conf_7"))


def resolve(
    scored: DataFrame,
    api_col: str = "api_name",
    cand_col: str = "odds_name",
) -> DataFrame:
    """Collapse scored pairs to one resolution row per api name.

    Output: api_col, matched_name (NULL if no match), confidence,
    strategy ('no_match' when unresolved), plus ``alternatives`` —
    the top-3 non-chosen candidates by chosen-strategy confidence
    (F14, enhanced_mapping.py:584-590).
    """
    # per-pair: first strategy index this pair would satisfy
    pass_idx = F.least(
        *[
            F.when(F.col(f"__conf_{i}") >= F.lit(t), F.lit(i))
            for i, _, t in STRATEGIES
        ]
    )
    w = Window.partitionBy(api_col)
    scored = scored.withColumn("__pass_idx", pass_idx).withColumn(
        "__s_star", F.min("__pass_idx").over(w)
    )
    conf_star = F.coalesce(
        *[
            F.when(F.col("__s_star") == i, F.col(f"__conf_{i}"))
            for i, _, _ in STRATEGIES
        ],
        F.lit(0.0),
    )
    strategy_star = F.coalesce(
        *[F.when(F.col("__s_star") == i, F.lit(name)) for i, name, _ in STRATEGIES],
        F.lit("no_match"),
    )
    scored = scored.withColumn("__conf_star", conf_star).withColumn(
        "__strategy", strategy_star
    )
    wo = Window.partitionBy(api_col).orderBy(
        F.desc("__conf_star"), F.asc(cand_col)
    )
    ranked = scored.withColumn("__rn", F.row_number().over(wo))
    # top-3 runners-up: collect (rank, name), sort by rank, drop the
    # winner, take 3 — sort BEFORE slice, collect_list order is not
    # deterministic across partitionings
    alts = F.slice(
        F.filter(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__rn"), F.col(cand_col).alias("name"))
                ).over(w)
            ),
            lambda s: s["__rn"] > 1,
        ),
        1,
        3,
    )
    best = ranked.withColumn("__alts", alts).filter(F.col("__rn") == 1)
    matched = F.col("__s_star").isNotNull()
    return best.select(
        F.col(api_col),
        F.when(matched, F.col(cand_col)).alias("matched_name"),
        F.when(matched, rnd(F.col("__conf_star"), 4)).alias("confidence"),
        F.when(matched, F.col("__strategy")).otherwise(F.lit("no_match")).alias("strategy"),
        F.transform(F.col("__alts"), lambda s: s["name"]).alias("alternatives"),
    )


def resolve_names(
    api_df: DataFrame,
    candidates_df: DataFrame,
    block_key: str | None = None,
    manual: DataFrame | None = None,
    learned: DataFrame | None = None,
    use_difflib: bool = False,
    api_col: str = "api_name",
    cand_col: str = "odds_name",
) -> DataFrame:
    """End-to-end cascade: pair generation (blocked, candidates
    broadcast) → scoring → collapse.

    ``manual``/``learned`` are mapping dims with columns
    (api_col, target name) — F7's dictionary strategies
    (/root/reference/enhanced_mapping.py:111-179,194-214).
    """
    if block_key:
        pairs = api_df.join(F.broadcast(candidates_df), on=block_key)
    else:
        pairs = api_df.crossJoin(F.broadcast(candidates_df))
    manual_col = learned_col = None
    if manual is not None:
        manual = manual.withColumnRenamed(
            [c for c in manual.columns if c != api_col][0], "__manual_target"
        )
        pairs = pairs.join(F.broadcast(manual), on=api_col, how="left")
        manual_col = "__manual_target"
    if learned is not None:
        learned = learned.withColumnRenamed(
            [c for c in learned.columns if c != api_col][0], "__learned_target"
        )
        pairs = pairs.join(F.broadcast(learned), on=api_col, how="left")
        learned_col = "__learned_target"
    scored = score_pairs(
        pairs,
        api_col=api_col,
        cand_col=cand_col,
        manual_col=manual_col,
        learned_col=learned_col,
        use_difflib=use_difflib,
    )
    return resolve(scored, api_col=api_col, cand_col=cand_col)


def learn_mappings(
    resolved: DataFrame,
    existing: DataFrame,
    min_confidence: float = 0.8,
    api_col: str = "api_name",
) -> DataFrame:
    """F13: write back high-confidence resolutions as learned
    mappings (MERGE semantics; enhanced_mapping.py:632-649).

    ``existing`` schema: (api_col, learned_name, confidence,
    strategy, verified)."""
    new = (
        resolved.filter(
            F.col("matched_name").isNotNull() & (F.col("confidence") >= min_confidence)
        )
        .select(
            F.col(api_col),
            F.col("matched_name").alias("learned_name"),
            F.col("confidence"),
            F.col("strategy"),
            F.lit(False).alias("verified"),
        )
    )
    return upsert_replace(existing, new, keys=[api_col], order_cols=["confidence"])


def attempt_log(resolved: DataFrame, api_col: str = "api_name") -> DataFrame:
    """F14: the append-only mapping_attempts side output, with the
    alternatives list JSON-serialized (N6;
    enhanced_mapping.py:612-630)."""
    return resolved.select(
        F.col(api_col),
        F.col("matched_name"),
        F.col("confidence"),
        F.col("strategy"),
        F.col("matched_name").isNotNull().alias("success"),
        F.to_json(F.col("alternatives")).alias("alternatives"),
    )
