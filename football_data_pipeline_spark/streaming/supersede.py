"""Keep-best streaming dedup — the STREAMING form of quality-aware
canonical selection (operators/curation.py's best_of_group policy,
VERDICT r9 item 3 theme, applied to the incremental funnel).
Reference parity: none — LLM-data-pipeline extension.

The plain dedup funnel (pipeline.dedup_batch_writer) is
first-arrival-wins: once a document is accepted, every later
near-copy is rejected — even a cleaner, fuller copy of the same
content. A keep-the-best corpus instead lets a HIGHER-QUALITY
arrival SUPERSEDE its accepted owner: the arrival is accepted, the
old owner gets a tombstone, and the live corpus is
``accepted − tombstoned``. Classic crawl reality: the first copy of
a page is often the truncated or boilerplate-ridden one.

Per micro-batch N::

    {root}/classification/batch_id=N   (doc_id, dup_kind, dup_of)
    {root}/accepted/batch_id=N         full doc rows (unique + superseding)
    {root}/rejected/batch_id=N         (doc_id, dup_of, reason)
    {root}/tombstones/batch_id=N       (doc_id, superseded_by, score,
                                        new_score)

Decision rule, per arriving doc classified dup-of live owner O:
score(arrival) > score(O) STRICTLY (quality.classify_quality, the
engine's one quality score) → arrival accepted, O tombstoned with
both scores in the audit row; ties and worse keep the incumbent
(stability: replaying equal-quality copies can never flip-flop the
corpus). Within-batch collapse stays min-id (pipeline.py's rule) —
the batch-level best-of policy is curation.best_of_group; this
module is about BATCH-vs-HISTORY supersession.

Correctness of owner liveness: the history the probe sees is
``accepted − tombstones`` (both pruned to batch_id < N), so a dup is
always compared against the CURRENT owner, never a superseded one —
without this, a doc could beat a long-dead copy while losing to its
live superseder. Tombstoned docs leave the probe set entirely; their
content is still represented by whoever superseded them (near-dup of
the old owner ⇒ near-dup of the new owner at the working thresholds,
the standard LSH-family transitivity-at-high-similarity argument —
and any miss is a false NEGATIVE of the screen, the same failure
class the base funnel already accepts from banding).

Exactly-once: all four outputs are batchId-keyed partition
overwrites; every history read prunes to ``batch_id < N`` (a replay
of batch N never sees its own partial output — including its own
tombstones); the scoring join is arrival-bounded (only owners
actually referenced by this batch's dups are re-scored).

100 TB shape: the probe is pipeline/dedup.py's incremental pass
unchanged; this module adds one anti-join of history against the
(tiny, reject-rate-bounded) tombstone set and one classify_quality
pass over arrivals + referenced owners — arrival-rate work, never
corpus-rate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from .pipeline import (
    HIST_COMPACT_EVERY,
    _maybe_compact_history,
    _read_history,
)


def supersede_decisions(
    new_docs: DataFrame,
    history: DataFrame,
    classified: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dup_of, score, new_score, wins) — the keep-best
    DECISION TABLE for every new doc classified as a dup of a live
    history owner: the owner's and arrival's quality scores and
    whether the arrival wins (strictly higher; NULL arrival scores
    never win, NULL owner scores lose to any scored arrival). Pure
    and sink-free so the driver oracle can check it
    (``q_supersede``); the writer consumes exactly this. Pass
    ``classified`` to reuse an already-persisted classification
    (the writer's exactly-once read-back)."""
    from ..operators.dedup import dedup_against_corpus
    from ..operators.quality import classify_quality

    if classified is None:
        classified = dedup_against_corpus(new_docs, history)
    dups = classified.filter(F.col("dup_kind") != "unique").select(
        "doc_id", F.col("matched_doc").alias("dup_of")
    )
    arr_scores = classify_quality(
        new_docs.join(dups.select("doc_id"), "doc_id")
    ).select("doc_id", F.col("score").alias("new_score"))
    owner_rows = history.join(
        dups.select(F.col("dup_of").alias("doc_id")).distinct(), "doc_id"
    )
    own_scores = classify_quality(owner_rows).select(
        F.col("doc_id").alias("dup_of"), "score"
    )
    return (
        dups.join(arr_scores, "doc_id", "left")
        .join(own_scores, "dup_of", "left")
        .withColumn(
            "wins",
            F.when(F.col("new_score").isNull(), F.lit(False)).otherwise(
                F.col("score").isNull()
                | (F.col("new_score") > F.col("score"))
            ),
        )
        .select("doc_id", "dup_of", "score", "new_score", "wins")
    )


def _live_history(spark, root: str, batch_id: int) -> DataFrame | None:
    """accepted − tombstoned, both pruned to batches before this one."""
    hist = _read_history(spark, root, "accepted", batch_id)
    if hist is None:
        return None
    tomb = _read_history(spark, root, "tombstones", batch_id)
    if tomb is None:
        return hist
    return hist.join(tomb.select("doc_id"), "doc_id", "left_anti")


def keep_best_batch_writer(
    corpus_root: str, compact_every: int | None = HIST_COMPACT_EVERY
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for a DOCUMENT stream under the keep-best
    policy — module docstring has layout, decision rule, liveness and
    exactly-once arguments."""
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import (
            batch_near_dup_drops,
            dedup_against_corpus,
            fingerprint,
        )
        spark = batch.sparkSession
        w = Window.partitionBy("__fp").orderBy("doc_id")
        collapsed = (
            batch.withColumn("__fp", fingerprint(F.col("text")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__fp", "__rn")
            .cache()
        )
        batch_rows = collapsed.join(
            batch_near_dup_drops(collapsed), "doc_id", "left_anti"
        ).cache()
        try:
            history = _live_history(spark, corpus_root, batch_id)
            if history is None:
                history = spark.createDataFrame([], batch_rows.schema)
            history = history.cache()
            classified = dedup_against_corpus(batch_rows, history)
            classified.write.mode("overwrite").parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )
            cls = spark.read.parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )

            judged = supersede_decisions(
                batch_rows, history, classified=cls
            ).localCheckpoint()

            tombstones = judged.filter(F.col("wins")).select(
                F.col("dup_of").alias("doc_id"),
                F.col("doc_id").alias("superseded_by"),
                "score",
                "new_score",
            )
            tombstones.write.mode("overwrite").parquet(
                f"{corpus_root}/tombstones/batch_id={batch_id}"
            )
            rejected = judged.filter(~F.col("wins")).select(
                "doc_id",
                "dup_of",
                F.lit("duplicate_not_better").alias("reason"),
            )
            rejected.write.mode("overwrite").parquet(
                f"{corpus_root}/rejected/batch_id={batch_id}"
            )
            keep_ids = cls.filter(F.col("dup_kind") == "unique").select(
                "doc_id"
            ).unionByName(judged.filter(F.col("wins")).select("doc_id"))
            batch_rows.join(keep_ids, "doc_id").write.mode("overwrite").parquet(
                f"{corpus_root}/accepted/batch_id={batch_id}"
            )
        finally:
            batch_rows.unpersist()
            collapsed.unpersist()
            history.unpersist()
        # BOTH history tables are probed every batch (accepted by the
        # dedup pass, tombstones by the liveness prune) — both fold
        # on the shared cadence, or the tombstone read amplifies one
        # directory per batch forever
        _maybe_compact_history(
            spark, corpus_root, "accepted", batch_id, compact_every
        )
        _maybe_compact_history(
            spark, corpus_root, "tombstones", batch_id, compact_every
        )

    return write_batch


def _supersede_oracle() -> str:
    # the incremental-dedup oracle's classification (dups only) plus
    # the quality oracle's per-doc score, compared under the strict
    # NULL-aware rule — both engines round the score to 4dp, so the
    # comparison can never disagree at a float boundary
    from ..operators.dedup import _incremental_oracle
    from ..operators.quality import WEIGHT_MOD, WEIGHT_SALT

    h = f"CAST('0x' || substr(md5('{WEIGHT_SALT}' || w), 1, 8) AS BIGINT)"
    return f"""
    WITH inc AS (
      SELECT doc_id, matched_doc AS dup_of
      FROM ({_incremental_oracle()}) WHERE dup_kind <> 'unique'
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             floor((CAST(sum(CAST(({h} % {WEIGHT_MOD} - 1000) / 1000.0
                                  AS DECIMAL(28,4))) AS DOUBLE) / count(*))
                   * 10000 + 0.5) / 10000 AS score
      FROM tok GROUP BY doc_id
    )
    SELECT i.doc_id, i.dup_of, o.score, a.score AS new_score,
           CASE WHEN a.score IS NULL THEN FALSE
                ELSE o.score IS NULL OR a.score > o.score END AS wins
    FROM inc i
    LEFT JOIN scored a ON a.doc_id = i.doc_id
    LEFT JOIN scored o ON o.doc_id = i.dup_of
    """


@query("q_supersede", oracle=_supersede_oracle())
def q_supersede(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-best funnel's decision stage over the incremental
    split (q_dedup_incremental's deterministic 20/80): every 'new'
    doc classified dup of a 'history' owner, both quality scores,
    and whether the arrival supersedes. The oracle recomposes the
    classification fixpoint AND the scores independently — a drift
    in the dedup probe, the scoring, or the strict NULL-aware win
    rule breaks the value hash."""
    from ..catalog import load
    from ..operators.dedup import INCR_MOD, INCR_SALT
    from ..operators.sampling import sample_bucket

    docs = load(spark, sf_dir, "documents")
    split = F.pmod(sample_bucket(F.col("doc_id"), INCR_SALT), F.lit(INCR_MOD))
    return supersede_decisions(
        docs.filter(split == 0), docs.filter(split != 0)
    )


#: "all batches" watermark for read_live_corpus — any id above every
#: real batch id
_ALL_BATCHES = 1 << 62


# --- snapshot-log-backed variant (VERDICT r10 "What's missing" 3) ------
#
# The writer above uses raw batch_id partition overwrites + the
# __hist_base__ compaction fold — one of the repo's two exactly-once
# mechanisms. The variant below backs the SAME funnel's accepted and
# tombstone tables with sources/snapshots.snapshot_append_writer
# instead: every micro-batch is an atomic marker-last commit, so the
# histories gain time travel, WAP-style auditability and the CAS
# story for free, and `maintain()` replaces the bespoke fold. The
# probe's `batch_id < N` pruning maps onto the log exactly: read the
# newest version whose marker's batch_id predates this batch
# (markers are batchId-stamped), which a replay cannot see past —
# the same replay-window guarantee the partition scheme's pruning
# gave. Crash windows: accepted and tombstones are separate logs, so
# a crash between the two commits leaves accepted-committed /
# tombstones-not; the replay is convergent because each
# snapshot_append_writer is individually replay-guarded and the
# decisions recompute deterministically from the persisted
# classification read-back + the AS-OF-pruned history
# (pytest-locked: marker delete + replay restores the corpus).


def _snapshot_table_before(
    spark: SparkSession, log_dir: str, batch_id: int
) -> DataFrame | None:
    """The funnels' `batch_id < N` history prune on the snapshot
    log — now the shared snapshots.read_table_before_batch (the
    base dedup funnel's snapshot variant uses it too)."""
    from ..sources.snapshots import read_table_before_batch

    return read_table_before_batch(spark, log_dir, batch_id)


def _snapshot_live_history(
    spark: SparkSession, root: str, batch_id: int
) -> DataFrame | None:
    acc = _snapshot_table_before(spark, f"{root}/accepted_log", batch_id)
    if acc is None:
        return None
    tomb = _snapshot_table_before(spark, f"{root}/tombstones_log", batch_id)
    if tomb is None:
        return acc
    return acc.join(tomb.select("doc_id"), "doc_id", "left_anti")


def keep_best_snapshot_writer(
    corpus_root: str,
) -> Callable[[DataFrame, int], None]:
    """keep_best_batch_writer with snapshot-log-backed accepted /
    tombstone tables (layout: ``{root}/accepted_log`` +
    ``{root}/accepted_data``, same pair for tombstones;
    classification/rejected stay plain batchId-keyed audit
    partitions). Decision rule, liveness and within-batch collapse
    are IDENTICAL to the partition-backed writer — pytest-locked by
    a twin run over the same batch sequence."""
    from ..sources.snapshots import snapshot_append_writer

    acc_write = snapshot_append_writer(
        f"{corpus_root}/accepted_log", f"{corpus_root}/accepted_data", []
    )
    tomb_write = snapshot_append_writer(
        f"{corpus_root}/tombstones_log", f"{corpus_root}/tombstones_data", []
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import (
            batch_near_dup_drops,
            dedup_against_corpus,
            fingerprint,
        )

        spark = batch.sparkSession
        w = Window.partitionBy("__fp").orderBy("doc_id")
        collapsed = (
            batch.withColumn("__fp", fingerprint(F.col("text")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__fp", "__rn")
            .cache()
        )
        batch_rows = collapsed.join(
            batch_near_dup_drops(collapsed), "doc_id", "left_anti"
        ).cache()
        # bound before the try: if the history read itself raises, the
        # finally must not mask the real error with an
        # UnboundLocalError from the unpersist (ADVICE r11)
        history = None
        try:
            history = _snapshot_live_history(spark, corpus_root, batch_id)
            if history is None:
                history = spark.createDataFrame([], batch_rows.schema)
            history = history.cache()
            classified = dedup_against_corpus(batch_rows, history)
            classified.write.mode("overwrite").parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )
            cls = spark.read.parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )

            judged = supersede_decisions(
                batch_rows, history, classified=cls
            ).localCheckpoint()

            tombstones = judged.filter(F.col("wins")).select(
                F.col("dup_of").alias("doc_id"),
                F.col("doc_id").alias("superseded_by"),
                "score",
                "new_score",
            )
            judged.filter(~F.col("wins")).select(
                "doc_id",
                "dup_of",
                F.lit("duplicate_not_better").alias("reason"),
            ).write.mode("overwrite").parquet(
                f"{corpus_root}/rejected/batch_id={batch_id}"
            )
            keep_ids = cls.filter(F.col("dup_kind") == "unique").select(
                "doc_id"
            ).unionByName(judged.filter(F.col("wins")).select("doc_id"))
            accepted = batch_rows.join(keep_ids, "doc_id")
            # marker-last atomic commits, each individually
            # replay-guarded (snapshot_append_writer's batch_id
            # watermark) — accepted first so a crash between the two
            # never hides an accepted doc's tombstone from a FUTURE
            # batch without also replaying this one
            acc_write(accepted, batch_id)
            tomb_write(tombstones, batch_id)
        finally:
            batch_rows.unpersist()
            collapsed.unpersist()
            if history is not None:
                history.unpersist()

    return write_batch


def read_live_corpus_snapshot(
    spark: SparkSession, corpus_root: str
) -> DataFrame:
    """read_live_corpus for the snapshot-backed layout: latest
    committed accepted snapshot minus latest committed tombstones —
    and because both are snapshot tables, any HISTORICAL corpus
    state is one `_snapshot_table_before(batch_id)` pair away."""
    return _require_live(spark, corpus_root, _ALL_BATCHES)


def _require_live(spark, corpus_root: str, watermark: int) -> DataFrame:
    live = _snapshot_live_history(spark, corpus_root, watermark)
    if live is None:
        raise ValueError(f"no accepted snapshots under {corpus_root!r}")
    return live


def read_live_corpus(spark: SparkSession, corpus_root: str) -> DataFrame:
    """The corpus a consumer trains on: every accepted doc that has
    not been superseded — accepted − tombstones, across ALL batches
    (use after the stream quiesces; mid-stream readers should prune
    by their own batch watermark). Reads through the funnel's own
    history reader so COMPACTED rows (the `.__hist_base__` fold) are
    included — a raw partition-glob read silently loses everything
    compaction has folded."""
    acc = _read_history(spark, corpus_root, "accepted", _ALL_BATCHES)
    if acc is None:
        raise ValueError(f"no accepted history under {corpus_root!r}")
    tomb = _read_history(spark, corpus_root, "tombstones", _ALL_BATCHES)
    if tomb is None:
        return acc
    return acc.join(tomb.select("doc_id"), "doc_id", "left_anti")
