"""Domain-targeted data selection — DSIR importance weights.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169) selects pretraining data
that *looks like* a small target domain: fit two bag-of-hashed-ngram
models — one on the target corpus, one on the raw pool — and weight
every raw document by its log-likelihood ratio

    log w(x) = Σ_tokens [ ln p_target(b(tok)) − ln p_raw(b(tok)) ]

where ``b`` hashes tokens into a fixed number of feature buckets.
Documents with positive average log-ratio are more target-like than
pool-like; resampling by these weights is the published recipe for
building domain-matched pretraining mixes.

In-engine model, like lm.py: the "training" of both n-gram models is
one shared aggregation over the token stream (conditional counts per
bucket), so the plan is count → broadcast λ-table → score. The
target corpus here is one source stratum of ``documents`` — the
shape DSIR is used in anger (e.g. "select web data that looks like
Wikipedia").

Float-parity contract (same as lm.py, the engine-wide rule for its
only transcendental): count ratios are IEEE-exact BIGINT divisions;
per-bucket λ = ln(pt) − ln(pr) is immediately stable-rounded to 4 dp
— a last-ulp libm disagreement flips the rounded value only within
~1e-16 of a bucket edge, and rounding happens per FEATURE BUCKET
(256 values), not per token; the rounded λs sum exactly in
DECIMAL(28,4), so per-document scores are order- and engine-
independent.

Scale shape (100 TB): one token-stream aggregation keyed on the
feature bucket — NB=256 groups, so the shuffle after map-side
combine is 256 rows per partition regardless of corpus size; the
λ-table is 256 rows → broadcast back onto the token stream; one
doc-keyed aggregation. Linear in total tokens, no window, no UDF,
identical asymptotics to lm_score. The hashed-feature trick is
exactly why DSIR scales: model size is fixed at NB buckets no matter
the vocabulary. Measured on the 10× corpus probe
(tools/scale_probe.py): 1.74s → 9.12s for 10× tokens — linear with
fixed overhead amortizing, same asymptote as lm_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: number of hashed feature buckets (DSIR ships 10k for prod; 256
#: keeps the oracle λ-table printable while preserving the shape)
N_BUCKETS = 256
#: hash salt for the token→bucket feature map
DSIR_SALT = "dsir-v1"
#: the target domain: one source stratum plays "Wikipedia"
TARGET_SOURCE = "src0"
#: stable-rounding precision of per-bucket log-ratios (lm.py rule)
LAM_DECIMALS = 4


def _bucket(col: F.Column) -> F.Column:
    """Token → feature bucket in [0, N_BUCKETS): the shared
    md5-prefix hash (sampling.sample_bucket) at N_BUCKETS resolution
    — the hashed n-gram feature map of the paper, unigram
    instance."""
    from .sampling import sample_bucket

    return sample_bucket(col, DSIR_SALT, N_BUCKETS)


def dsir_weights(
    docs: DataFrame,
    target_source: str = TARGET_SOURCE,
) -> DataFrame:
    """(doc_id, source, n_tokens, dsir_logratio, selected) for every
    document OUTSIDE the target stratum: the mean per-token hashed-
    unigram log-likelihood ratio of target vs raw pool, and the
    keep verdict at the natural 0 threshold (more target-like than
    pool-like). See the module docstring for the plan shape and the
    float-parity contract."""
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_remove(F.split("text", " "), "")).alias("w"),
    ).withColumn("b", _bucket(F.col("w")))
    is_target = F.col("source") == target_source
    # ONE pass over the token stream trains BOTH models: conditional
    # counts per bucket (256 groups — map-side combine reduces the
    # shuffle to 256 rows/partition).
    cnt = tok.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_target, 1).otherwise(0)).alias("cr"),
    )
    tot = cnt.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    scale = 10**LAM_DECIMALS
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.floor(
                (
                    F.log((F.col("ct") + 1.0) / (F.col("nt") + N_BUCKETS))
                    - F.log((F.col("cr") + 1.0) / (F.col("nr") + N_BUCKETS))
                )
                * scale
                + F.lit(0.5)
            )
            / scale
        ).alias("lam"),
    )
    # λ-table is exactly N_BUCKETS rows → broadcast unconditionally.
    return (
        tok.filter(~is_target)
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(
                    (
                        F.sum(F.col("lam").cast("decimal(28,4)")).cast("double")
                        / F.count("*")
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("dsir_logratio"),
        )
        .withColumn("selected", F.col("dsir_logratio") > 0)
    )


def _dsir_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    tb AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('{DSIR_SALT}:' || w), 1, 8)) AS BIGINT)
               % {N_BUCKETS} AS b
      FROM tok
    ),
    cnt AS (
      SELECT b,
             sum(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN source <> '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS cr
      FROM tb GROUP BY b
    ),
    tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt),
    lam AS (
      SELECT b,
             floor((ln((ct + 1.0) / (nt + {N_BUCKETS}))
                    - ln((cr + 1.0) / (nr + {N_BUCKETS}))) * 10000 + 0.5) / 10000
               AS lam
      FROM cnt CROSS JOIN tot
    )
    SELECT t.doc_id,
           any_value(t.source) AS source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor((CAST(sum(CAST(lam.lam AS DECIMAL(28,4))) AS DOUBLE)
                  / count(*)) * 10000 + 0.5) / 10000 AS dsir_logratio,
           floor((CAST(sum(CAST(lam.lam AS DECIMAL(28,4))) AS DOUBLE)
                  / count(*)) * 10000 + 0.5) / 10000 > 0 AS selected
    FROM tb t JOIN lam ON lam.b = t.b
    WHERE t.source <> '{TARGET_SOURCE}'
    GROUP BY t.doc_id
    """


@query("q_dsir_weights", oracle=_dsir_oracle())
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`dsir_weights` over the documents table
    with ``src0`` playing the target domain (see the module docstring
    for semantics and the 100 TB shape).

    The synthetic corpus draws every source from the SAME token
    distribution, so no document is genuinely target-like: smoothing
    flattens the smaller target model and every log-ratio lands
    slightly negative — ``selected`` = false everywhere is the
    EXPECTED value here (same honesty note as q_decontaminate), and
    the hash still pins the full count→λ→score computation. The
    discriminative path (a target with its own vocabulary ranks
    target-like docs strictly above pool-like ones, selected fires)
    is exercised by the crafted-corpus pytest in
    tests/test_corpus_passes.py."""
    return dsir_weights(load(spark, sf_dir, "documents"))
