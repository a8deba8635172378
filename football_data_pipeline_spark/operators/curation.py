"""Quality-aware canonical selection — the dedup policy production
curation pipelines actually ship. Exact dedup (dedup.q_dedup_exact)
keeps the MIN-ID member of each duplicate group: correct for
determinism, but a real corpus release keeps the HIGHEST-QUALITY
copy (the members of an exact word-set group differ in casing,
boilerplate, truncation — their quality scores differ even though
their fingerprints collide). Reference parity: none —
LLM-data-pipeline extension (SURVEY.md §2 scale extensions).

This operator composes two proven passes (never re-implements
them): the canonical word-set fingerprint (dedup.fingerprint — THE
shared exact-dup definition) and the hashed-linear quality score
(quality.classify_quality), then picks each duplicate group's
canonical as argmax(score), ties broken by min doc_id so the choice
is deterministic; scoreless docs (empty token sets) order last.

100 TB shape: one scan for the fingerprint projection, the
classifier's single token-explode aggregate, a doc_id equi join,
and TWO window functions over the SAME fingerprint partitioning —
one shuffle on the fingerprint key total (the windows share the
exchange), the same asymptote as q_dedup_exact's groupBy. No
driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .dedup import _WORD_SET_SQL, fingerprint
from .quality import WEIGHT_MOD, WEIGHT_SALT, classify_quality


def best_of_group(docs: DataFrame) -> DataFrame:
    """One row per MEMBER of each exact-duplicate group (n_docs >
    1): (doc_id, fingerprint, score, n_docs, canonical_doc_id,
    is_canonical) — canonical = highest score, ties to the smaller
    doc_id, NULL scores last. Callers keep `is_canonical` rows and
    drop the rest; the non-canonical rows ARE the audit trail."""
    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
    scored = classify_quality(docs).select("doc_id", "score")
    j = fp.join(scored, "doc_id", "left")
    w_best = (
        Window.partitionBy("fingerprint")
        .orderBy(F.desc_nulls_last("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("fingerprint")
    ranked = j.select(
        "doc_id",
        "fingerprint",
        "score",
        F.count("*").over(w_all).alias("n_docs"),
        F.first("doc_id").over(w_best).alias("canonical_doc_id"),
    )
    return ranked.filter(F.col("n_docs") > 1).select(
        "doc_id",
        "fingerprint",
        "score",
        "n_docs",
        "canonical_doc_id",
        (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
    )


def _best_of_group_oracle() -> str:
    # fingerprint SQL = dedup.q_dedup_exact's proven twin; score SQL
    # = quality.q_quality_classifier's; the window frame is explicit
    # on both engines so first_value agrees rowwise
    h = f"CAST('0x' || substr(md5('{WEIGHT_SALT}' || w), 1, 8) AS BIGINT)"
    return f"""
    WITH tok AS (
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
    ),
    fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort({_WORD_SET_SQL}), ' '))
               AS fingerprint
      FROM documents
    ),
    j AS (
      SELECT f.doc_id, f.fingerprint, s.score
      FROM fp f LEFT JOIN scored s ON s.doc_id = f.doc_id
    ),
    ranked AS (
      SELECT doc_id, fingerprint, score,
             count(*) OVER (PARTITION BY fingerprint) AS n_docs,
             first_value(doc_id) OVER (
               PARTITION BY fingerprint
               ORDER BY score DESC NULLS LAST, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS canonical_doc_id
      FROM j
    )
    SELECT doc_id, fingerprint, score,
           CAST(n_docs AS BIGINT) AS n_docs,
           canonical_doc_id,
           doc_id = canonical_doc_id AS is_canonical
    FROM ranked WHERE n_docs > 1
    """


@query("q_dedup_best_of_group", oracle=_best_of_group_oracle())
def q_dedup_best_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup over the documents table: every
    duplicate-group member with its group's chosen canonical (argmax
    quality, deterministic ties) — the keep-the-best-copy policy
    (module docstring has the rationale and the one-shuffle plan
    argument)."""
    return best_of_group(load(spark, sf_dir, "documents"))
