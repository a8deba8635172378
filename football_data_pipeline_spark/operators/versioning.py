"""Corpus snapshot diffing — data versioning for release audits.

Every corpus release pipeline ships a "what changed since the last
snapshot" report: documents added, removed, changed (same id,
different content), and unchanged. The reference's nightly
maintenance recomputes whole-table counts
(.github/workflows/football-data-pipeline.yml's report steps,
validate_data.py); the at-scale form diffs two snapshots directly so
a release note — and an incremental downstream rebuild — can be
driven by the delta, not a full rescan of consumers.

Content equality is the engine's canonical exact-dup fingerprint
(dedup.fingerprint — md5 of the sorted distinct word set), so
"changed" here agrees byte-for-byte with what the dedup family and
the dataset card call a content match.

Scale shape: one fingerprint projection per side (scan-stage, no
shuffle), ONE full-outer equi-join on doc_id, then a source-keyed
count rollup. No window, no cross product; the join is the same
doc_id-hash shuffle any incremental pass pays. At 100 TB both sides
prune to (doc_id, source, 32-byte fp) before shuffling — never the
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .dedup import _WORD_SET_SQL, fingerprint
from .sampling import sample_bucket

#: deterministic synthetic "previous snapshot" for the driver query:
#: bucket 0 of 20 is absent from prev (→ added in cur), bucket 1's
#: prev text carries a ' legacy' suffix (→ changed), and bucket 2
#: spawns a prev-only ghost doc at -(doc_id) - 1 (→ removed) —
#: real doc_ids are non-negative, so the negated id cannot collide
#: with a real doc at ANY corpus size (a fixed additive offset
#: collides once the corpus passes the offset; ADVICE r4)
SNAP_SALT = "snap-v1"
SNAP_MOD = 20


def snapshot_diff(cur: DataFrame, prev: DataFrame) -> DataFrame:
    """(source, n_added, n_removed, n_changed, n_unchanged): the
    release delta between two corpus snapshots, per source. Both
    inputs need (doc_id, source, text); content equality is the
    canonical fingerprint, compared NULL-safely. Removed docs take
    their source from the previous snapshot (they have no current
    row). Presence in a snapshot is carried by an explicit literal
    flag, NOT inferred from the nullable fingerprint — a doc whose
    text is NULL is still PRESENT, and must classify as
    changed/unchanged rather than masquerade as added/removed."""
    c = cur.select(
        "doc_id",
        F.col("source").alias("cur_source"),
        fingerprint(F.col("text")).alias("cur_fp"),
        F.lit(True).alias("in_cur"),
    )
    p = prev.select(
        "doc_id",
        F.col("source").alias("prev_source"),
        fingerprint(F.col("text")).alias("prev_fp"),
        F.lit(True).alias("in_prev"),
    )
    joined = c.join(p, "doc_id", "full_outer").select(
        F.coalesce("cur_source", "prev_source").alias("source"),
        F.when(F.col("in_prev").isNull(), "added")
        .when(F.col("in_cur").isNull(), "removed")
        .when(~F.col("cur_fp").eqNullSafe(F.col("prev_fp")), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return joined.groupBy("source").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).alias(
            "n_unchanged"
        ),
    )


#: oracle-side canonical fingerprint, composed from the ONE shared
#: word-set SQL (dedup's single-definition rule — never re-inline)
_FP_SQL = "md5(array_to_string(list_sort(" + _WORD_SET_SQL + "), ' '))"


def _diff_oracle() -> str:
    bucket = (
        f"CAST(('0x' || substr(md5('{SNAP_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % 10000 % {SNAP_MOD}"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, source, text, {bucket} AS b FROM documents
    ),
    prev AS (
      SELECT doc_id, source,
             CASE WHEN b = 1 THEN text || ' legacy' ELSE text END AS text
      FROM base WHERE b <> 0
      UNION ALL
      SELECT -doc_id - 1, source, text FROM base WHERE b = 2
    ),
    c AS (SELECT doc_id, source AS cur_source, {_FP_SQL} AS cur_fp,
                 TRUE AS in_cur
          FROM documents),
    p AS (SELECT doc_id, source AS prev_source, {_FP_SQL} AS prev_fp,
                 TRUE AS in_prev
          FROM prev),
    j AS (
      SELECT coalesce(c.cur_source, p.prev_source) AS source,
             CASE WHEN p.in_prev IS NULL THEN 'added'
                  WHEN c.in_cur IS NULL THEN 'removed'
                  WHEN c.cur_fp IS DISTINCT FROM p.prev_fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM c FULL OUTER JOIN p ON p.doc_id = c.doc_id
    )
    SELECT source,
           CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged
    FROM j GROUP BY source
    """


@query("q_corpus_diff", oracle=_diff_oracle())
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`snapshot_diff`: the current documents
    table diffed against a deterministic synthetic previous snapshot
    (hash bucket 0 missing → added, bucket 1 text-suffixed → changed,
    bucket 2 ghost-copied → removed), so all four statuses are
    non-vacuous and the hash pins the whole join + classification."""
    docs = load(spark, sf_dir, "documents")
    base = docs.withColumn(
        "b", F.pmod(sample_bucket(F.col("doc_id"), SNAP_SALT), F.lit(SNAP_MOD))
    )
    prev_main = base.filter(F.col("b") != 0).select(
        "doc_id",
        "source",
        F.when(F.col("b") == 1, F.concat(F.col("text"), F.lit(" legacy")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    prev_ghost = base.filter(F.col("b") == 2).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "source", "text"
    )
    return snapshot_diff(docs, prev_main.unionByName(prev_ghost))
