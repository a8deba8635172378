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


# --- repetition-aware mixture (data-constrained epoching) ----------

#: maximum repetitions of any document in the mixed corpus. Data-
#: constrained scaling (Muennighoff et al. 2023, arXiv:2305.16264)
#: shows up-to-~4 epochs of a scarce domain trade near-lossless
#: against discarding abundant domains; past that, returns decay.
MAX_EPOCHS = 4
EPOCH_SALT = "epochs-v1"


def epoch_mixture_plan(docs: DataFrame, stratum_col: str = "lang") -> DataFrame:
    """(stratum, target_pm, n_docs, need_docs, full_epochs,
    rem_rate_bp): the UPSAMPLING dual of ``mixture_rates``.

    Waterfilling treats the scarcest stratum as a hard ceiling and
    throws away abundant data. When repetition is allowed, the
    ceiling lifts MAX_EPOCHS-fold: the largest target corpus is

        T      = min_s floor(n_s * MAX_EPOCHS * 1000 / target_pm_s)
        need_s = (target_pm_s * T) DIV 1000          (<= MAX_EPOCHS * n_s)

    and stratum s contributes ``full_epochs = need_s DIV n_s`` whole
    copies of every doc plus one extra copy of a deterministic
    hash-sampled ``need_s MOD n_s`` subset. All BIGINT (same
    headroom argument as the waterfilling plan); the only data pass
    is the count aggregate.
    """
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    counts = counts.withColumn("target_pm", _target_pm_col(F.col(stratum_col)))
    t_total = counts.agg(
        F.min(
            F.expr(f"(n_docs * {MAX_EPOCHS} * 1000) DIV target_pm")
        ).alias("t_total")
    )
    return counts.crossJoin(F.broadcast(t_total)).select(
        stratum_col,
        "target_pm",
        "n_docs",
        F.expr("(target_pm * t_total) DIV 1000").alias("need_docs"),
        F.expr("((target_pm * t_total) DIV 1000) DIV n_docs").alias("full_epochs"),
        F.expr(
            f"((((target_pm * t_total) DIV 1000) % n_docs) * {RESOLUTION})"
            " DIV n_docs"
        ).alias("rem_rate_bp"),
    )


def epoch_mixture_emit(
    docs: DataFrame, stratum_col: str = "lang", plan: DataFrame | None = None
) -> DataFrame:
    """Input docs replicated per the epoch plan, each copy tagged
    with ``epoch`` (1-based). The replication is a generator-side
    ``explode(sequence(...))`` — zero shuffle beyond the broadcast
    plan join; downstream shard writers see epoch as an ordinary
    column (ordering.py's deterministic epoch ordering composes on
    top). Docs whose stratum owes 0 copies disappear, mirroring the
    waterfilled sampler's drop semantics.
    """
    if plan is None:
        plan = epoch_mixture_plan(docs, stratum_col)
    copies = F.col("full_epochs") + (
        sample_bucket(F.col("doc_id"), EPOCH_SALT) < F.col("rem_rate_bp")
    ).cast("int")
    return (
        docs.join(
            F.broadcast(plan.select(stratum_col, "full_epochs", "rem_rate_bp")),
            stratum_col,
        )
        # explicit +1 step: the two-arg sequence(1, 0) DESCENDS to
        # [1, 0] — a zero-copy doc must explode to nothing, and the
        # stepped form errors rather than reverses, so guard stop
        # with greatest(copies, 0) semantics via a pre-filter
        .filter(copies > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), copies, F.lit(1))))
        .drop("full_epochs", "rem_rate_bp")
    )


def _epochs_oracle() -> str:
    from .sampling import _bucket_sql

    return f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             {_target_pm_sql('lang')} AS target_pm
      FROM documents GROUP BY lang
    ),
    tt AS (
      SELECT min((n_docs * {MAX_EPOCHS} * 1000) // target_pm) AS t_total
      FROM counts
    ),
    plan AS (
      SELECT lang, target_pm, n_docs,
             (target_pm * t_total) // 1000 AS need_docs,
             ((target_pm * t_total) // 1000) // n_docs AS full_epochs,
             ((((target_pm * t_total) // 1000) % n_docs) * {RESOLUTION})
               // n_docs AS rem_rate_bp
      FROM counts, tt
    ),
    emitted AS (
      SELECT d.lang,
             p.full_epochs
               + CASE WHEN {_bucket_sql('d.doc_id', EPOCH_SALT)} < p.rem_rate_bp
                      THEN 1 ELSE 0 END AS copies
      FROM documents d JOIN plan p USING (lang)
    )
    SELECT p.lang, p.target_pm, p.n_docs, p.need_docs, p.full_epochs,
           p.rem_rate_bp,
           CAST(coalesce(sum(e.copies), 0) AS BIGINT) AS n_emitted
    FROM plan p LEFT JOIN emitted e ON p.lang = e.lang
    GROUP BY p.lang, p.target_pm, p.n_docs, p.need_docs, p.full_epochs,
             p.rem_rate_bp
    """


@query("q_mixture_epochs", oracle=_epochs_oracle())
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware mixture report: per language, the target
    share, the epoch plan (whole copies + remainder sampling rate),
    and the achieved emitted-copy count from the actual replicated
    stream (explode-verified, not re-derived arithmetic). 10× probe:
    0.55 s → 0.60 s (near-flat — one count aggregate + a broadcast
    plan over the scan; the report is one row per stratum at any
    corpus size)."""
    docs = load(spark, sf_dir, "documents")
    plan = epoch_mixture_plan(docs)
    emitted = (
        epoch_mixture_emit(docs, plan=plan)
        .groupBy("lang")
        .agg(F.count("*").alias("n_emitted"))
    )
    return plan.join(F.broadcast(emitted), "lang", "left").select(
        "lang",
        "target_pm",
        "n_docs",
        "need_docs",
        "full_epochs",
        "rem_rate_bp",
        F.coalesce("n_emitted", F.lit(0)).alias("n_emitted"),
    )


# --- temperature-scaled sampling (multilingual alpha-smoothing) ----

#: sqrt-temperature (alpha = 0.5). mT5/XLM-R style smoothing keeps
#: p_s proportional to n_s^alpha; alpha=0.5 is chosen here because
#: sqrt is an IEEE-754 CORRECTLY-ROUNDED primitive in every engine,
#: so the keep-rate doubles are bit-identical between Spark and the
#: DuckDB oracle — a pow(x, 0.3) form could drift a ULP at the
#: floor() boundary. (Other alphas: lift the rate computation to the
#: driver over the tiny per-stratum count table and broadcast the
#: integer rates — same plan, no parity risk.)
TEMPERATURE_SALT = "temp-v1"


def temperature_rates(docs: DataFrame, stratum_col: str = "lang") -> DataFrame:
    """(stratum, n_docs, rate_bp): keep-rates making the sampled
    corpus composition proportional to sqrt(n_s) — abundant strata
    are damped, scarce ones kept whole (the smallest stratum's rate
    is exactly RESOLUTION). rate_s = sqrt(n_min / n_s), floored to
    bucket units."""
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    return counts.crossJoin(F.broadcast(n_min)).select(
        stratum_col,
        "n_docs",
        F.floor(
            F.lit(float(RESOLUTION))
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double"))
        ).alias("rate_bp"),
    )


def temperature_sample(
    docs: DataFrame, stratum_col: str = "lang", rates: DataFrame | None = None
) -> DataFrame:
    """Documents surviving the temperature cut (scan-stage hash
    predicate, same contract as every sampler here)."""
    if rates is None:
        rates = temperature_rates(docs, stratum_col)
    return docs.join(
        F.broadcast(rates.select(stratum_col, "rate_bp")), stratum_col
    ).filter(sample_bucket(F.col("doc_id"), TEMPERATURE_SALT) < F.col("rate_bp"))


def _temperature_oracle() -> str:
    from .sampling import _bucket_sql

    return f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    nm AS (SELECT min(n_docs) AS n_min FROM counts),
    rates AS (
      SELECT lang, n_docs,
             CAST(floor({RESOLUTION}.0
                        * sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)))
                  AS BIGINT) AS rate_bp
      FROM counts, nm
    ),
    sampled AS (
      SELECT d.lang
      FROM documents d JOIN rates r USING (lang)
      WHERE {_bucket_sql('d.doc_id', TEMPERATURE_SALT)} < r.rate_bp
    )
    SELECT r.lang, r.n_docs, r.rate_bp,
           CAST(count(s.lang) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN sampled s ON r.lang = s.lang
    GROUP BY r.lang, r.n_docs, r.rate_bp
    """


@query("q_temperature_sample", oracle=_temperature_oracle())
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt-temperature sampling report: per language, corpus count,
    the damped keep-rate, and the achieved sample size. 10× probe:
    0.44 s → 0.48 s (near-flat, same one-aggregate shape as the
    waterfilled mixture)."""
    docs = load(spark, sf_dir, "documents")
    rates = temperature_rates(docs)
    sampled = (
        temperature_sample(docs, rates=rates)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    return rates.join(F.broadcast(sampled), "lang", "left").select(
        "lang",
        "n_docs",
        "rate_bp",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )
