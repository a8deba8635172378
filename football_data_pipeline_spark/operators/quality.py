"""Hashed-linear quality classification — the fasttext-shaped model
pass (Joulin et al. 2016) that web-scale corpora run after heuristic
filtering: score = a linear function over a hashed bag-of-words,
thresholded to keep/drop.

Reference parity: none — LLM-data-pipeline extension (SURVEY.md §2).
The heuristic sibling (length/punctuation/stopword ratios) is
``textstats.q_text_stats``; this operator is the MODEL-based scorer
that consumes such features' survivors.

Weights here are deterministic pseudo-weights derived from each
token's md5 (both engines regenerate them — the hyperplane trick
from embedsearch.py), so correctness of the PLAN is oracle-checkable
without shipping a trained model. A production run swaps in trained
weights one of two ways, neither changing the plan shape:
- recompute-from-hash stays if the model is hash-featured (fasttext
  buckets): weights live in a broadcast array indexed by bucket;
- a learned vocabulary table becomes a broadcast join on the token.

Float parity: per-token weights are exact thousandths, summed as
DECIMAL (order-independent — functions/stable.py), and the keep
decision thresholds the EXACT decimal sum, so no engine's float
summation or exp() rounding can flip a label. The sigmoid is
deliberately not applied: it is monotone, so thresholding the logit
is the same decision, and libm-vs-java exp() last-ulp differences
never enter the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import davg
from ..registry import query

#: weights are (md5_32(token) mod 2001 − 1000)/1000 ∈ [−1, 1] —
#: exact multiples of 0.001, so DECIMAL(28,4) sums are exact.
WEIGHT_MOD = 2001
WEIGHT_SALT = "qw:"


def _quality_classifier_oracle() -> str:
    h = f"CAST('0x' || substr(md5('{WEIGHT_SALT}' || w), 1, 8) AS BIGINT)"
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, source,
             unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      FROM documents
    ),
    weighted AS (
      SELECT doc_id, lang, source,
             ({h} % {WEIGHT_MOD} - 1000) / 1000.0 AS wt
      FROM tok
    )
    SELECT doc_id, lang, source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor((CAST(sum(CAST(wt AS DECIMAL(28,4))) AS DOUBLE) / count(wt))
                 * 10000 + 0.5) / 10000 AS score,
           sum(CAST(wt AS DECIMAL(28,4))) > 0 AS keep
    FROM weighted
    GROUP BY doc_id, lang, source
    """


def classify_quality(docs: DataFrame) -> DataFrame:
    """Score every document with a hashed-bag-of-words linear model
    and emit the keep/drop decision: score = mean token weight,
    keep = (Σ weights > 0).

    Scale shape: explode → per-token md5 bucket + weight (all
    codegen, no lookup structure at all in the hash-featured form) →
    ONE hash aggregation keyed doc_id with map-side partial
    aggregation carrying (decimal sum, count). No join, no second
    shuffle; cost is linear in total tokens, the same asymptote as
    tokenizing the corpus at all. Hot documents cannot skew: the
    aggregation key is doc_id, whose fan-in is the document's own
    token count.
    """
    tok = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.array_remove(F.split("text", " "), "")).alias("w"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(WEIGHT_SALT), F.col("w"))), 1, 8), 16, 10
    ).cast("long")
    weighted = tok.select(
        "doc_id",
        "lang",
        "source",
        ((h % WEIGHT_MOD - 1000) / 1000.0).alias("wt"),
    )
    return weighted.groupBy("doc_id", "lang", "source").agg(
        F.count("*").alias("n_tokens"),
        davg("wt", 4).alias("score"),
        (F.sum(F.col("wt").cast("decimal(28,4)")) > 0).alias("keep"),
    )


@query("q_quality_classifier", oracle=_quality_classifier_oracle())
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`classify_quality` over the documents
    table (see that docstring for semantics and the 100 TB shape)."""
    return classify_quality(load(spark, sf_dir, "documents"))
