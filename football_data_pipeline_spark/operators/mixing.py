"""Target-mixture rebalancing: compute per-stratum sampling rates
FROM a target composition, then apply them — the domain-mixing pass
a training-data pipeline runs before tokenization ("the final corpus
should be 35% en, 25% zh, ...").

This is the data-dependent half that sampling.py's
``stratified_sample`` (fixed, hand-given rates) leaves to the
caller: given target per-mille shares, the largest achievable
down-sampled corpus is found by waterfilling — the binding stratum
is the one with the least data relative to its target share, and it
is kept at 100% while every other stratum is cut to match:

    T       = min over strata of floor(n_s * 1000 / target_pm_s)
    rate_s  = target_pm_s * T / (1000 * n_s)      (<= 1 by choice of T)

All arithmetic is BIGINT-exact in both engines (floor division, no
floats) so the oracle cannot drift on rounding. Magnitude headroom:
``target_pm * T * RESOLUTION <= 1e3 * T * 1e4``, safe in BIGINT for
corpora up to ~9e11 documents per stratum — beyond 100 TB at any
plausible document size; past that, lift the products to DECIMAL.

Plan shape for 100 TB: one count-by-stratum aggregate (tiny result),
a 1-row global min, both broadcast back onto the scan — the sampling
verdict itself is a scan-stage predicate on a deterministic hash
bucket (same ``sample_bucket`` contract as every sampler here). One
pass over the data, no wide shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .sampling import RESOLUTION, sample_bucket

#: target corpus composition in per-mille, by language
TARGET_PM = {"en": 350, "zh": 250, "es": 150, "fr": 150, "de": 100}
DEFAULT_PM = 50  # any stratum outside the dict
MIXTURE_SALT = "mixture-v1"


def _target_pm_col(stratum: Column) -> Column:
    pm = F.lit(DEFAULT_PM)
    for k, v in TARGET_PM.items():
        pm = F.when(stratum == k, v).otherwise(pm)
    return pm


def _target_pm_sql(stratum: str) -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in TARGET_PM.items())
    return f"CASE {stratum} {whens} ELSE {DEFAULT_PM} END"


def mixture_rates(docs: DataFrame, stratum_col: str = "lang") -> DataFrame:
    """(stratum, target_pm, n_docs, rate_bp): waterfilled keep-rates
    in bucket units. The binding stratum's rate_bp is exactly
    RESOLUTION whenever its target_pm divides 1000*n_docs (always
    true for the test corpus; at real corpus sizes the floor
    granularity shaves at most RESOLUTION*target_pm/(1000*n_docs)
    bucket units — vanishing as n grows)."""
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    counts = counts.withColumn("target_pm", _target_pm_col(F.col(stratum_col)))
    t_total = counts.agg(
        F.min(F.expr("(n_docs * 1000) DIV target_pm")).alias("t_total")
    )
    return counts.crossJoin(F.broadcast(t_total)).select(
        stratum_col,
        "target_pm",
        "n_docs",
        F.least(
            F.lit(RESOLUTION),
            F.expr(f"(target_pm * t_total * {RESOLUTION}) DIV (1000 * n_docs)"),
        ).alias("rate_bp"),
    )


def target_mixture_sample(
    docs: DataFrame, stratum_col: str = "lang", rates: DataFrame | None = None
) -> DataFrame:
    """Documents surviving the waterfilled mixture cut."""
    if rates is None:
        rates = mixture_rates(docs, stratum_col)
    return docs.join(
        F.broadcast(rates.select(stratum_col, "rate_bp")), stratum_col
    ).filter(sample_bucket(F.col("doc_id"), MIXTURE_SALT) < F.col("rate_bp"))


def _mixture_oracle() -> str:
    from .sampling import _bucket_sql

    return f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             {_target_pm_sql('lang')} AS target_pm
      FROM documents GROUP BY lang
    ),
    tt AS (
      SELECT min((n_docs * 1000) // target_pm) AS t_total FROM counts
    ),
    rates AS (
      SELECT lang, target_pm, n_docs,
             least({RESOLUTION}, (target_pm * t_total * {RESOLUTION}) // (1000 * n_docs))
               AS rate_bp
      FROM counts, tt
    ),
    sampled AS (
      SELECT d.lang
      FROM documents d JOIN rates r USING (lang)
      WHERE {_bucket_sql('d.doc_id', MIXTURE_SALT)} < r.rate_bp
    )
    SELECT r.lang, r.target_pm, r.n_docs, r.rate_bp,
           CAST(count(s.lang) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN sampled s ON r.lang = s.lang
    GROUP BY r.lang, r.target_pm, r.n_docs, r.rate_bp
    """


@query("q_target_mixture", oracle=_mixture_oracle())
def q_target_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalancing report: per language, the corpus count,
    the waterfilled keep-rate, and the achieved sample size."""
    docs = load(spark, sf_dir, "documents")
    rates = mixture_rates(docs)
    sampled = (
        target_mixture_sample(docs, rates=rates)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        rates.join(F.broadcast(sampled), "lang", "left")
        .select(
            "lang",
            "target_pm",
            "n_docs",
            "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )
