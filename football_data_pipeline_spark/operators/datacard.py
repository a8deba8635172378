"""Dataset-card rollup — the datasheet a corpus pipeline publishes
with a release (Gebru et al., "Datasheets for Datasets"): per
(source, lang) stratum, the composition and hygiene numbers a
consumer reads before training on the data.

Composes the engine's own passes rather than re-deriving them:
per-document token counts / model scores come from
``quality.classify_quality``, exact-duplicate attribution from the
same canonical word-set fingerprint ``dedup.q_dedup_exact`` groups
by. One new operator, zero new semantics — the card IS the join of
the pipeline's outputs.

Reference parity: the closest reference artifact is the weekly data
summary (reports.py builders); the card is its training-corpus
analogue, extension block of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import davg, rnd
from ..registry import query
from .dedup import _WORD_SET_SQL, fingerprint
from .quality import WEIGHT_MOD, WEIGHT_SALT, classify_quality


def _datacard_oracle() -> str:
    h = f"CAST('0x' || substr(md5('{WEIGHT_SALT}' || w), 1, 8) AS BIGINT)"
    wt = f"CAST(({h} % {WEIGHT_MOD} - 1000) / 1000.0 AS DECIMAL(28,4))"
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    per_doc_q AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             floor((CAST(sum({wt}) AS DOUBLE) / count(*))
                   * 10000 + 0.5) / 10000 AS score,
             sum({wt}) > 0 AS keep
      FROM tok GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort({_WORD_SET_SQL}), ' ')) AS f
      FROM documents
    ),
    dup AS (
      SELECT doc_id,
             doc_id <> min(doc_id) OVER (PARTITION BY f) AS is_dup,
             count(*) OVER (PARTITION BY f) AS grp
      FROM fp
    ),
    per_doc AS (
      SELECT d.source, d.lang, d.doc_id,
             coalesce(q.n_tokens, 0) AS n_tokens,
             q.score,
             coalesce(q.keep, FALSE) AS keep,
             (u.is_dup AND u.grp > 1) AS is_dup
      FROM documents d
      LEFT JOIN per_doc_q q ON q.doc_id = d.doc_id
      LEFT JOIN dup u ON u.doc_id = d.doc_id
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           floor((CAST(sum(CAST(n_tokens AS DECIMAL(28,4))) AS DOUBLE)
                  / count(*)) * 100 + 0.5) / 100 AS avg_tokens,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_dup_docs,
           floor((sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * 10000 + 0.5) / 10000 AS dup_rate,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           floor((sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * 10000 + 0.5) / 10000 AS keep_rate,
           floor((CAST(sum(CAST(score AS DECIMAL(28,4))) AS DOUBLE)
                  / count(score)) * 10000 + 0.5) / 10000 AS avg_score
    FROM per_doc
    GROUP BY source, lang
    """


def dataset_card(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) release card: document and token counts,
    exact-duplicate attribution, and classifier keep rates.

    Scale shape: three well-spread wide exchanges and nothing else —
    the classifier's per-doc aggregation (keyed doc_id), the
    fingerprint group (keyed on a 32-byte hash; the per-fingerprint
    canonical min comes from the same aggregation), and the doc_id
    equi-joins stitching per-doc frames back to the base scan. The
    final rollup keys on (source, lang) — a handful of rows — with
    map-side partial aggregation doing the collapse, so the card
    costs O(corpus) with no per-stratum skew sensitivity (fan-in to
    a stratum happens only in the last, already-partial-aggregated
    exchange).
    """
    per_doc_q = classify_quality(docs).select("doc_id", "n_tokens", "score", "keep")
    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("f"))
    groups = fp.groupBy("f").agg(
        F.count("*").alias("grp"), F.min("doc_id").alias("canon")
    )
    dup = fp.join(groups, "f").select(
        "doc_id",
        ((F.col("grp") > 1) & (F.col("doc_id") != F.col("canon"))).alias("is_dup"),
    )
    per_doc = (
        docs.select("source", "lang", "doc_id")
        .join(per_doc_q, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "source",
            "lang",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "score",
            F.coalesce(F.col("keep"), F.lit(False)).alias("keep"),
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        )
    )
    n_dup = F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
    n_keep = F.sum(F.when(F.col("keep"), 1).otherwise(0))
    return per_doc.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        davg("n_tokens", 2).alias("avg_tokens"),
        n_dup.cast("long").alias("exact_dup_docs"),
        rnd(n_dup * 1.0 / F.count("*"), 4).alias("dup_rate"),
        n_keep.cast("long").alias("n_keep"),
        rnd(n_keep * 1.0 / F.count("*"), 4).alias("keep_rate"),
        davg("score", 4).alias("avg_score"),
    )


@query("q_dataset_card", oracle=_datacard_oracle())
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`dataset_card` over the documents
    table (see that docstring for semantics and the 100 TB shape)."""
    return dataset_card(load(spark, sf_dir, "documents"))
