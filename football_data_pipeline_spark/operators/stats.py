"""Exact-moment statistics: correlation / regression profiling built
from EXACT integer/decimal co-moment sums instead of the engines'
native ``corr``/``covar_samp`` aggregates.

Why not F.corr at 100 TB: the native aggregates stream float
co-moments (Welford/merge forms), so the last ulps depend on
partition count and merge order — the same job on 200 vs 2000
executors can disagree in the 12th digit, and a rounded report can
flip at a .xxx5 boundary (the exact failure stable.py documents for
plain float SUM). Here every co-moment (n, Σx, Σy, Σxy, Σx², Σy²) is
summed EXACTLY (integer columns sum as BIGINT/DECIMAL — no rounding
anywhere), and the float formula runs ONCE on the final exact sums:
the result is bit-identical on any cluster size, any engine that
implements IEEE doubles and a correctly-rounded sqrt. Same shuffle
shape as the native aggregate (one partial+final hash aggregate) —
determinism costs nothing here.

Pearson r and the OLS slope come from the textbook co-moment forms:
    r     = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²))
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)

Reference tie-in: the reference's dashboards chart win_percentage
against goals_for etc. (/root/reference/streamlit_dashboard.py team
analysis); a corpus-scale profiler wants the correlation matrix of
its quality signals with the same reproducibility contract as the
rest of this engine.

10x probe (sf0.1 documents replicated 10x; medians of 3):
0.36 -> 0.35 s - flat (one hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import rnd
from ..registry import query


def exact_corr_stats(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """(group, n, corr, slope) from exact co-moment sums of two
    INTEGER columns. The six sums are exact (LONG up to 2^63, no
    float joins the computation until the final closed-form
    expression), so the output is partition-count- and
    engine-independent. Groups with zero variance in either column
    yield NULL corr/slope (0/0 guarded to NULL, matching SQL NULLIF
    semantics). Headroom: n·Σx² must stay under 2^63 — fine for
    per-group counts into the billions at these value magnitudes; a
    100 TB run with larger x ranges casts the sums to DECIMAL(38,0)
    (same exactness, wider headroom) before the closed form."""
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    sums = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    # the float expression mirrors the oracle SQL token-for-token so
    # both engines evaluate the identical IEEE expression tree
    num = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    denom = F.sqrt(varx * vary)
    corr = F.when(denom != 0, num / denom)
    slope = F.when(varx != 0, num / varx)
    return sums.select(
        group_col,
        "n",
        rnd(corr, round_to).alias("corr"),
        rnd(slope, round_to).alias("slope"),
    )


@query(
    "q_corr_profile",
    oracle="""
    WITH w AS (
      SELECT lang, n_chars,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_words
      FROM documents
    ),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(n_words) AS BIGINT) AS sy,
             CAST(sum(n_chars * n_words) AS BIGINT) AS sxy,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
             CAST(sum(n_words * n_words) AS BIGINT) AS syy
      FROM w GROUP BY lang
    )
    SELECT lang, n,
           floor((CAST(n * sxy - sx * sy AS DOUBLE)
                  / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE)), 0))
                 * 10000 + 0.5) / 10000 AS corr,
           floor((CAST(n * sxy - sx * sy AS DOUBLE)
                  / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0))
                 * 10000 + 0.5) / 10000 AS slope
    FROM s
    """,
)
def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation and OLS slope between
    document character count and word count — the quality-signal
    correlation profile, computed through the exact-co-moment path
    so the number is identical at any partition count (the native
    F.corr streams float moments and is not). The synthetic corpus
    correlates near 1 by construction; the operator's value is the
    reproducibility contract, measured by the driver hash across
    engines.
    """
    docs = load(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(F.array_remove(F.split(F.col("text"), " "), "")).alias(
            "n_words"
        ),
    )
    return exact_corr_stats(docs, "lang", "n_chars", "n_words")
