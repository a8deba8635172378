"""k-anonymity audit (Sweeney 2002) over quasi-identifier
combinations — the structured-data privacy check that complements
the text-side PII scan/redaction (prep.pii_scan, redact.redact_pii):
a row whose quasi-identifier combination is shared by fewer than k
rows is re-identifiable even after its direct identifiers are
redacted.

The audit reports the k-anonymity profile at every GENERALIZATION
LEVEL of the quasi-identifier lattice in one pass: level 0 keeps the
raw attribute (here: exact document length), level 1 coarsens it
(length decile bucket), level 2 drops it entirely — the standard
coarsen-until-k-anonymous ladder. A release pipeline reads this
report bottom-up and publishes the first level whose
rows-at-risk count is acceptable.

Scale shape: the level dimension is a generator-side explode (3
rows per input row, all in codegen), then ONE hash aggregate keyed
(level, quasi-id combo) and a second tiny aggregate keyed (level)
— the same two-phase shape as every rollup in this engine, with
map-side combine doing the heavy lifting. No window, no join.

10x probe (sf0.1 documents replicated 10x; medians of 3):
0.38 -> 0.37 s - flat (aggregate-bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: anonymity floor: a (lang, source, length-attr) combination shared
#: by fewer than K documents marks those documents re-identifiable
K_ANON = 5

#: level-1 coarsening width for the length attribute
BUCKET = 100


def k_anonymity_profile(
    docs: DataFrame, k: int = K_ANON, bucket: int = BUCKET
) -> DataFrame:
    """(level, n_groups, n_small_groups, rows_at_risk, k) — the
    anonymity profile of the (lang, source, length) quasi-identifier
    at generalization levels 0 (exact length), 1 (length // bucket),
    2 (length dropped). Monotone by construction: coarsening can
    only merge groups, so rows_at_risk never increases with level —
    asserted in tests/test_privacy.py."""
    length = F.col("n_chars")
    levels = F.array(
        F.struct(F.lit(0).alias("level"), length.cast("string").alias("attr")),
        F.struct(
            F.lit(1).alias("level"),
            F.floor(length / bucket).cast("string").alias("attr"),
        ),
        F.struct(F.lit(2).alias("level"), F.lit("*").alias("attr")),
    )
    leveled = docs.select(
        "lang", "source", F.explode(levels).alias("l")
    ).select("lang", "source", "l.level", "l.attr")
    groups = leveled.groupBy("level", "lang", "source", "attr").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        groups.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("n") < k, 1).otherwise(0)).alias(
                "n_small_groups"
            ),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )
        .withColumn("k", F.lit(k).cast("long"))
    )


@query(
    "q_k_anonymity",
    oracle=f"""
    WITH leveled AS (
      SELECT lang, source, 0 AS level,
             CAST(n_chars AS VARCHAR) AS attr FROM documents
      UNION ALL
      SELECT lang, source, 1,
             CAST(CAST(floor(n_chars / {BUCKET}) AS BIGINT) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT lang, source, 2, '*' FROM documents
    ),
    groups AS (
      SELECT level, lang, source, attr, count(*) AS n
      FROM leveled GROUP BY ALL
    )
    SELECT level,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST({K_ANON} AS BIGINT) AS k
    FROM groups GROUP BY level
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ladder over the documents table's (lang, source,
    length) quasi-identifiers: per generalization level, how many
    quasi-id groups exist, how many are smaller than k=5, and how
    many documents those small groups expose. The release pipeline's
    go/no-go privacy report — read bottom-up, publish the first
    acceptable level (see module docstring for the one-pass shape).
    """
    return k_anonymity_profile(load(spark, sf_dir, "documents"))
