"""Statistical language-model scoring — the CCNet-shaped perplexity
filter (Wenzek et al. 2020): score every document by its average
token log-probability under a language model and let downstream
keep/bucket by fluency. CCNet uses a pretrained KenLM; this operator
trains the LM IN-ENGINE — a corpus unigram model with add-one
smoothing — because the interesting part at 100 TB is the plan, and
the plan is identical for any table-backed n-gram model: count,
broadcast, score. A bigram upgrade adds one more count aggregation
keyed (w1, w2) and a second broadcast join; nothing else changes.

Float parity notes (this operator is the engine's only use of a
transcendental in an oracle-checked value):
- p(w) = (c+1)/(N+V) is a ratio of BIGINTs — IEEE division is
  correctly rounded, so both engines hold the identical double;
- ln() is NOT guaranteed correctly rounded across libms (JVM
  StrictMath-adjacent vs DuckDB's C libm), so each token's log-prob
  is immediately stable-rounded to 4 dp (floor(x·1e4 + 0.5) — a
  last-ulp ln() disagreement flips the rounded value only if x sits
  within ~1e-16 of a bucket edge: P ≈ 1e-12 per distinct token, ~0
  at any corpus size since rounding happens per VOCAB entry, not
  per token instance);
- the 4 dp log-probs are exact in DECIMAL(28,4): per-document sums
  are exact integer arithmetic, order- and engine-independent
  (functions/stable.py rationale).

Scale shape: one token-stream aggregation builds the vocab counts
(map-side combined, keyed on the word — the same shuffle tokenizing
the corpus costs anyway); the LM table is vocab-sized → broadcast
back onto the token stream (AQE falls back to a shuffle join for a
web-scale vocab); one final doc-keyed aggregation. Linear in total
tokens, no window, no UDF. Measured on the 10× corpus probe
(tools/scale_probe.py): 0.96s → 2.77s for 10× tokens — linear with
fixed overhead amortizing; the classifier (quality.py, same shape
minus the model join) probes 0.62s → 4.04s and chunking (pure
generator, no shuffle at all) 0.33s → 0.73s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: stable-rounding precision of per-token log-probs (see module
#: docstring for why rounding happens before summation)
LP_DECIMALS = 4


def _lm_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (
      SELECT (SELECT count(*) FROM tok) AS n,
             (SELECT count(*) FROM cnt) AS v
    ),
    lm AS (
      SELECT w,
             floor(ln((c + 1.0) / (n + v)) * 10000 + 0.5) / 10000 AS lp
      FROM cnt CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor((CAST(sum(CAST(lm.lp AS DECIMAL(28,4))) AS DOUBLE)
                  / count(*)) * 10000 + 0.5) / 10000 AS avg_logp
    FROM tok t JOIN lm ON lm.w = t.w
    GROUP BY t.doc_id
    """


def lm_score(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra_cols, n_tokens, avg_logp): average add-one-
    smoothed unigram log-probability per document — higher (less
    negative) means the document looks like the corpus, the fluency
    signal CCNet buckets into head/middle/tail. ``extra_cols`` ride
    the token stream (doc-constant columns like lang/source), so
    consumers never need a second corpus scan to recover them. See
    the module docstring for the plan shape and float-parity
    contract."""
    tok = docs.select(
        "doc_id",
        *extra_cols,
        F.explode(F.array_remove(F.split("text", " "), "")).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    scale = 10**LP_DECIMALS
    lm = cnt.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * scale
                + F.lit(0.5)
            )
            / scale
        ).alias("lp"),
    )
    # no broadcast hint: AQE broadcasts a small vocab and falls back
    # to a shuffle join for a web-scale one — a hard hint would make
    # the documented fallback impossible (Spark never demotes it)
    return (
        tok.join(lm, "w")
        .groupBy("doc_id", *extra_cols)
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(
                    (
                        F.sum(F.col("lp").cast("decimal(28,4)")).cast("double")
                        / F.count("*")
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("avg_logp"),
        )
    )


@query("q_lm_score", oracle=_lm_oracle())
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`lm_score` over the documents table
    (see the module docstring for semantics and the 100 TB shape)."""
    return lm_score(load(spark, sf_dir, "documents"))


def _fluency_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (
      SELECT (SELECT count(*) FROM tok) AS n,
             (SELECT count(*) FROM cnt) AS v
    ),
    lm AS (
      SELECT w,
             floor(ln((c + 1.0) / (n + v)) * 10000 + 0.5) / 10000 AS lp
      FROM cnt CROSS JOIN tot
    ),
    scored AS (
      SELECT t.doc_id, t.lang,
             floor((CAST(sum(CAST(lm.lp AS DECIMAL(28,4))) AS DOUBLE)
                    / count(*)) * 10000 + 0.5) / 10000 AS avg_logp
      FROM tok t JOIN lm ON lm.w = t.w
      GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, avg_logp,
           CASE ntile(3) OVER (PARTITION BY lang
                               ORDER BY avg_logp DESC, doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scored
    """


@query("q_fluency_buckets", oracle=_fluency_oracle())
def q_fluency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per-language terciles of the
    LM fluency score (most-fluent third = head, the slice CCNet
    treats as highest quality). Deterministic: ntile ordered by
    (avg_logp DESC, doc_id) so ties cannot wander across buckets.

    Scale shape: everything up to the scored stream is lm_score's
    linear plan; the tercile is a per-LANGUAGE window — partitions
    are language-sized, which is the same per-stratum grain CCNet
    shards by, and at 100 TB the window becomes a two-pass
    approx-quantile cut per language (approxQuantile on avg_logp,
    then a free-standing bucket projection) — the ntile form is the
    exact small-stratum twin.
    """
    docs = load(spark, sf_dir, "documents")
    scored = lm_score(docs, extra_cols=("lang",)).drop("n_tokens")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logp"), F.asc("doc_id")
    )
    tile = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "avg_logp",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def _bigram_oracle() -> str:
    return f"""
    WITH docs_w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM docs_w, UNNEST(range(1, len(ws))) AS t(i)
    ),
    c1 AS (SELECT w1, count(*) AS c FROM big GROUP BY w1),
    c2 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
    v AS (SELECT count(DISTINCT w2) AS v FROM big),
    lm AS (
      SELECT c2.w1, c2.w2,
             floor(ln((c2.c + 1.0) / (c1.c + v.v)) * 10000 + 0.5) / 10000
               AS lp
      FROM c2 JOIN c1 ON c1.w1 = c2.w1 CROSS JOIN v
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor((CAST(sum(CAST(lm.lp AS DECIMAL(28,4))) AS DOUBLE)
                  / count(*)) * 10000 + 0.5) / 10000 AS avg_logp
    FROM big b JOIN lm ON lm.w1 = b.w1 AND lm.w2 = b.w2
    GROUP BY b.doc_id
    """


def lm_score_bigram(docs: DataFrame) -> DataFrame:
    """The bigram upgrade the module docstring promises: score each
    document by its mean conditional log-probability
    ln p(w2|w1) = ln((c(w1,w2)+1)/(c(w1)+V)) under add-one smoothing
    — exactly one more count aggregation (keyed (w1,w2)) and one
    more model join than the unigram plan; documents with fewer than
    two tokens carry no transition and drop out, as in any bigram
    perplexity. Same float-parity contract: exact count ratios,
    stable-rounded ln, decimal summation."""
    from ..functions.sliding import _shifted_zip

    ws = F.array_remove(F.split("text", " "), "")
    big = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(_shifted_zip(F.col("ws"), 2, "w")).alias("p"))
        .select("doc_id", F.col("p.w0").alias("w1"), F.col("p.w1").alias("w2"))
        # the shifted-zip pads the tail window with NULL on length-1
        # inputs only, which the size filter already excluded — but a
        # defensive non-null guard keeps the pair stream exact
        .filter(F.col("w2").isNotNull())
    )
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    v = big.agg(F.count_distinct("w2").alias("v"))
    scale = 10**LP_DECIMALS
    lm = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            (
                F.floor(
                    F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))) * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("lp"),
        )
    )
    return (
        big.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.floor(
                    (
                        F.sum(F.col("lp").cast("decimal(28,4)")).cast("double")
                        / F.count("*")
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("avg_logp"),
        )
    )


@query("q_lm_bigram", oracle=_bigram_oracle())
def q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`lm_score_bigram` over the documents
    table (see that docstring for semantics and the 100 TB shape)."""
    return lm_score_bigram(load(spark, sf_dir, "documents"))
