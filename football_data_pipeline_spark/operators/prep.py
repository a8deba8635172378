"""Corpus-preparation operators: contamination scanning and
token-budget sequence packing — the last mile between a cleaned
corpus and a training run.

Scale notes:
- the PII scan is a pure projection (regexp_count inside the scan's
  codegen stage) followed by one rollup aggregate — embarrassingly
  parallel at any size;
- packing partitions the cumulative-sum window by (lang, shard) where
  shard is a deterministic hash bucket, so no window partition grows
  with corpus size (a naive per-language cumsum would put an entire
  language's corpus in one task). Contiguous first-fit within a shard
  is the standard distributed compromise: globally optimal bin
  packing is NP-hard and inherently sequential; per-shard contiguous
  fill wastes at most one document's tokens per bin boundary and
  keeps the whole operator in two codegen'd window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .sampling import RESOLUTION, sample_bucket

#: deliberately simple, engine-portable patterns (no lookarounds —
#: must mean the same thing to Spark's Java regex and DuckDB's RE2)
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PHONE_RE = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

TOKEN_BUDGET = 2048  # tokens per packed training sequence
N_SHARDS = 8


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document contamination counters (emails, phone-shaped
    strings) — projection only; keep/redact policy is downstream."""
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
    )


@query(
    "q_pii_scan",
    oracle=f"""
    WITH scanned AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(n_emails) AS BIGINT) AS total_emails,
           CAST(sum(n_phones) AS BIGINT) AS total_phones
    FROM scanned GROUP BY source
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination rollup per source: flagged-document and total
    hit counts for email/phone patterns — the go/no-go report a
    cleaning pipeline emits before training."""
    scanned = pii_scan(load(spark, sf_dir, "documents"))
    flagged = F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(0)
    return scanned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(flagged).alias("n_flagged"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
    )


def pack_sequences(
    docs: DataFrame, budget: int = TOKEN_BUDGET, n_shards: int = N_SHARDS
) -> DataFrame:
    """Assign each document to a (lang, shard, bin): contiguous
    token-budget fill in deterministic doc_id order within a hash
    shard. A document starts in the bin where its shard-local
    cumulative token count entered; bins therefore hold ≥ budget
    tokens only through their last straddling document."""
    tokens = F.size(F.array_remove(F.split("text", " "), ""))
    shard = F.pmod(sample_bucket(F.col("doc_id"), "pack-v1"), F.lit(n_shards))
    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", tokens.alias("n_tokens"), shard.alias("shard"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "bin", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget).cast("long")
        )
    )


@query(
    "q_token_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
             CAST(('0x' || substr(md5('pack-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {RESOLUTION} % {N_SHARDS} AS shard
      FROM documents
    ),
    packed AS (
      SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT lang, shard, CAST(floor((cum_tokens - n_tokens) / {TOKEN_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc
    FROM packed
    GROUP BY lang, shard, bin
    """,
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing summary: per (lang, shard, bin) —
    document count, packed token total, and the bin's first document.
    The hash pins every document's bin assignment (via first_doc +
    counts), i.e. the whole deterministic packing, not just totals."""
    packed = pack_sequences(load(spark, sf_dir, "documents"))
    return packed.groupBy("lang", "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
