"""Distribution-drift monitoring — PSI (population stability index)
between a reference corpus profile and a current one, batch and
streaming. Reference parity: none — LLM-data-pipeline extension
(SURVEY.md §2 scale extensions; the data-quality twin of
profiling.py: profiling answers "what does the corpus look like",
this answers "did the feed CHANGE under me").

Why a pipeline needs it: a crawl source silently switching template,
a dedup upstream regressing, or a tokenizer change all shift the
length/quality distribution of arriving documents long before any
single-row gate fires. PSI over a fixed bucketing is the standard
production monitor: PSI = Σ_b (p_cur(b) − p_ref(b)) ·
ln(p_cur(b) / p_ref(b)), ≥ 0, with the classic operating bands
< 0.1 stable / 0.1–0.2 drifting / > 0.2 act (PSI_ALERT).

Engine-parity discipline (the lm.py ln() story): shares are ratios
of identical integers (IEEE-deterministic doubles on any engine);
the ONE transcendental — ln of the share ratio — is stable-rounded
to 4 dp per bucket before the multiply, and each term is
stable-rounded to 6 dp, so the DuckDB oracle and any two cluster
runs agree bit-for-bit. Laplace (+1 over the union bucket set)
smoothing keeps one-sided buckets finite — a brand-new bucket in
the current feed is exactly the drift signal, not a NaN.

Bucketing = the integer-exact power-of-two token bucket shared with
textstats.q_seq_histogram (binary-length − 1, never float log2).
Zero-token docs carry bucket −1 (they are drift too — a feed
suddenly full of empty docs must move the index, not vanish from
it).

100 TB shape: one token-count aggregate per side (the q_seq_
histogram plan), profiles are ≤ ~64 rows at any corpus size, the
PSI join is profile × profile. The streaming writer re-profiles
only the ARRIVING micro-batch against a broadcast-sized frozen
reference (collected once at writer build — bounded by the bucket
count), writes per-batch report + 1-row summary as batchId-keyed
overwrites with NO history read: replay-idempotent by construction.

10x probe (documents replicated 10x, 5k -> 50k docs, medians of 3):
q_drift_psi 0.57 -> 0.66 s — the token-count aggregates absorb the
10x scan map-side; everything after them is bucket-count-sized.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import oracle_rnd, rnd
from ..registry import query
from .textstats import _WORDS_SQL, _words

#: classic PSI operating threshold: > 0.2 → act
PSI_ALERT = 0.2

#: stable-rounding precision of the per-bucket ln term / PSI term
_LN_DP = 4
_TERM_DP = 6


def length_profile(docs: DataFrame) -> DataFrame:
    """(bucket, n_docs): power-of-two token-length histogram —
    bucket = floor(log2(n_tokens)) integer-exactly, −1 for
    zero-token docs. One hash aggregate; ≤ ~64 rows out."""
    n_tokens = F.size(_words())
    return (
        docs.select(n_tokens.alias("n_tokens"))
        .withColumn(
            "bucket",
            F.when(F.col("n_tokens") <= 0, F.lit(-1)).otherwise(
                F.length(
                    F.conv(F.col("n_tokens").cast("string"), 10, 2)
                )
                - 1
            ).cast("long"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def psi_report(cur_profile: DataFrame, ref_profile: DataFrame) -> DataFrame:
    """(bucket, ref_n, cur_n, ref_share, cur_share, psi_term): the
    per-bucket PSI decomposition over the UNION of both profiles'
    buckets. Shares are Laplace-smoothed — (n+1)/(N+B) with B = the
    union bucket count — so one-sided buckets contribute a finite,
    large term instead of blowing up. Sum psi_term for the index;
    the summands are the diagnosis (WHICH buckets moved)."""
    joined = (
        cur_profile.select("bucket", F.col("n_docs").alias("cur_n"))
        .join(
            ref_profile.select("bucket", F.col("n_docs").alias("ref_n")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    # totals via ONE global window instead of an agg + crossJoin —
    # the window is bounded by the BUCKET count (≤ ~64 rows at any
    # corpus size), and it halves the upstream scans: the two
    # profile aggregations run once, not once per totals consumer
    w_all = Window.partitionBy(F.lit(1))
    with_shares = joined.select(
        "bucket",
        "ref_n",
        "cur_n",
        (
            (F.col("ref_n") + 1.0)
            / (
                F.sum("ref_n").over(w_all)
                + F.count(F.lit(1)).over(w_all)
            )
        ).alias("__rp"),
        (
            (F.col("cur_n") + 1.0)
            / (
                F.sum("cur_n").over(w_all)
                + F.count(F.lit(1)).over(w_all)
            )
        ).alias("__cp"),
    )
    ln_ratio = rnd(F.log(F.col("__cp") / F.col("__rp")), _LN_DP)
    return with_shares.select(
        "bucket",
        "ref_n",
        "cur_n",
        rnd(F.col("__rp"), _TERM_DP).alias("ref_share"),
        rnd(F.col("__cp"), _TERM_DP).alias("cur_share"),
        rnd((F.col("__cp") - F.col("__rp")) * ln_ratio, _TERM_DP).alias(
            "psi_term"
        ),
    )


def psi_total(report: DataFrame) -> DataFrame:
    """1 row: (psi, alert) — the index and the PSI_ALERT verdict.
    The 6 dp terms are summed exactly in DECIMAL, so the total is
    partition-order independent."""
    return report.agg(
        F.sum(F.col("psi_term").cast("decimal(28,6)"))
        .cast("double")
        .alias("psi")
    ).select("psi", (F.col("psi") > PSI_ALERT).alias("alert"))


def drift_batch_writer(
    root: str, ref_profile: DataFrame
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for a DOCUMENT stream: per micro-batch,
    profile the arrivals, PSI them against the frozen reference, and
    write the per-bucket report + a 1-row summary::

        {root}/drift/batch_id=N          (bucket, ref_n, cur_n,
                                          ref_share, cur_share,
                                          psi_term)
        {root}/drift_summary/batch_id=N  (n_docs, psi, alert)

    The reference profile is collected ONCE here (bounded by the
    bucket count, ≤ ~64 rows) and rebuilt inside each batch's
    session — foreachBatch frames must not close over another
    session's lazy plans. Both writes are batchId-keyed overwrites
    with no state read-back: a crash-replay of batch N rewrites
    byte-equivalent partitions."""
    ref_rows = [
        (r["bucket"], r["n_docs"]) for r in ref_profile.collect()
    ]
    if not ref_rows:
        raise ValueError("empty reference profile")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        ref = spark.createDataFrame(ref_rows, "bucket long, n_docs long")
        report = psi_report(length_profile(batch), ref).localCheckpoint()
        report.write.mode("overwrite").parquet(
            f"{root}/drift/batch_id={batch_id}"
        )
        n_docs = batch.count()
        psi_total(report).select(
            F.lit(n_docs).alias("n_docs"), "psi", "alert"
        ).write.mode("overwrite").parquet(
            f"{root}/drift_summary/batch_id={batch_id}"
        )

    return write_batch


def _drift_oracle() -> str:
    # the seq-histogram bucket form (binary length − 1, −1 for empty
    # docs), Laplace shares over the union bucket set, ln
    # stable-rounded at 4 dp, terms at 6 dp — lm.py's engine-parity
    # recipe
    return f"""
    WITH t AS (
      SELECT doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents
    ),
    b AS (
      SELECT doc_id,
             CASE WHEN n_tokens <= 0 THEN CAST(-1 AS BIGINT)
                  ELSE CAST(length(bin(n_tokens)) - 1 AS BIGINT)
             END AS bucket
      FROM t
    ),
    ref AS (
      SELECT bucket, count(*) AS ref_n FROM b
      WHERE doc_id % 2 = 0 GROUP BY bucket
    ),
    cur AS (
      SELECT bucket, count(*) AS cur_n FROM b
      WHERE doc_id % 2 = 1 GROUP BY bucket
    ),
    j AS (
      SELECT coalesce(ref.bucket, cur.bucket) AS bucket,
             CAST(coalesce(ref_n, 0) AS BIGINT) AS ref_n,
             CAST(coalesce(cur_n, 0) AS BIGINT) AS cur_n
      FROM ref FULL OUTER JOIN cur ON ref.bucket = cur.bucket
    ),
    tot AS (
      SELECT sum(ref_n) AS rt, sum(cur_n) AS ct, count(*) AS nb FROM j
    ),
    shares AS (
      SELECT bucket, ref_n, cur_n,
             (ref_n + 1.0) / ((SELECT rt FROM tot) + (SELECT nb FROM tot))
               AS rp,
             (cur_n + 1.0) / ((SELECT ct FROM tot) + (SELECT nb FROM tot))
               AS cp
      FROM j
    )
    SELECT bucket, ref_n, cur_n,
           {oracle_rnd('rp', _TERM_DP)} AS ref_share,
           {oracle_rnd('cp', _TERM_DP)} AS cur_share,
           {oracle_rnd(f"(cp - rp) * ({oracle_rnd('ln(cp / rp)', _LN_DP)})",
                       _TERM_DP)} AS psi_term
    FROM shares
    """


@query("q_drift_psi", oracle=_drift_oracle())
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor's per-bucket PSI decomposition between the
    even-doc_id half (reference) and the odd half (current) of the
    documents table — a near-null drift fixture, so the terms are
    small but non-zero and every piece of the arithmetic (bucketing,
    smoothing, the stable-rounded ln) is pinned by the value hash."""
    docs = load(spark, sf_dir, "documents")
    return psi_report(
        length_profile(docs.filter(F.col("doc_id") % 2 == 1)),
        length_profile(docs.filter(F.col("doc_id") % 2 == 0)),
    )
