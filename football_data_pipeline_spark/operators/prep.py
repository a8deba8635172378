"""Corpus-preparation operators: contamination scanning (PII and
benchmark leakage) and token-budget sequence packing — the last mile
between a cleaned corpus and a training run.

Scale notes:
- the PII scan is a pure projection (regexp_count inside the scan's
  codegen stage) followed by one rollup aggregate — embarrassingly
  parallel at any size;
- decontamination joins exploded train n-grams against the DISTINCT
  eval n-gram set. Benchmarks are small by nature (MBs against 100 TB
  of train), so the eval set broadcasts and the scan stays a
  map-side probe — no shuffle of train data beyond the per-doc count
  aggregation, which is keyed on high-cardinality doc_id;
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
from ..functions.stable import rnd
from ..functions.sliding import sliding_join
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


# --- benchmark decontamination (train/eval n-gram overlap) ---

#: split salt + modulus: bucket 0 of 50 ⇒ a deterministic ~2% of
#: documents stand in for the eval benchmark
DECON_SALT = "decon-v1"
DECON_HOLDOUT_MOD = 50
#: fraction of a train doc's distinct n-grams that must appear in the
#: eval set before the doc is flagged contaminated
DECON_THRESHOLD = 0.5

def _with_shingles(docs: DataFrame) -> DataFrame:
    """word-3-gram shingles, identical construction (and engine
    parity) to dedup.ngram_dedup_pairs — capture-free sliding_join,
    not transform-over-sequence-with-slice (functions/sliding.py
    documents the O(len²) inlining blowup of the naive form)."""
    words = F.array_remove(F.split(F.col("text"), " "), "")
    return docs.select("doc_id", "source", words.alias("words")).select(
        "doc_id",
        "source",
        F.array_distinct(sliding_join(F.col("words"), 3)).alias("shingles"),
    )


def contamination_overlap(
    train: DataFrame, eval_docs: DataFrame, threshold: float = DECON_THRESHOLD
) -> DataFrame:
    """Per-train-document benchmark-leakage scan: the fraction of the
    document's distinct word-3-grams that occur anywhere in the eval
    corpus, and a contaminated verdict at ``threshold``.

    The canonical decontamination shape (n-gram overlap against held
    -out benchmarks): explode train shingles, probe the broadcast
    DISTINCT eval n-gram set, count hits per doc, LEFT-join the
    counts back so zero-overlap documents keep a 0 row. The ratio
    uses engine-stable rounding (functions.stable.rnd).
    """
    tr = _with_shingles(train)
    ev_set = (
        _with_shingles(eval_docs)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    hits = (
        tr.select("doc_id", F.explode("shingles").alias("g"))
        .join(F.broadcast(ev_set), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        tr.select("doc_id", "source", F.size("shingles").alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
        .withColumn(
            "overlap_ratio", rnd(F.col("n_overlap") / F.col("n_shingles"), 4)
        )
        .withColumn("contaminated", F.col("overlap_ratio") >= threshold)
    )


@query(
    "q_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS words,
             CAST(('0x' || substr(md5('{DECON_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {RESOLUTION} % {DECON_HOLDOUT_MOD} AS b
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source, b,
             list_distinct(list_transform(range(1, greatest(len(words) - 1, 2)),
                           i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ),
    ev AS (SELECT DISTINCT unnest(shingles) AS g FROM sh WHERE b = 0),
    tr AS (SELECT doc_id, source, unnest(shingles) AS g, len(shingles) AS n_sh
           FROM sh WHERE b <> 0),
    ov AS (
      SELECT t.doc_id, any_value(t.source) AS source,
             any_value(t.n_sh) AS n_sh, count(e.g) AS n_overlap
      FROM tr t LEFT JOIN ev e ON t.g = e.g
      GROUP BY t.doc_id
    ),
    scored AS (
      SELECT *, floor(n_overlap * 1.0 / n_sh * 10000 + 0.5) / 10000 AS ratio
      FROM ov
    )
    SELECT source,
           count(*) AS n_train_docs,
           CAST(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overlapping,
           CAST(sum(CASE WHEN ratio >= {DECON_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(sum(n_overlap) AS BIGINT) AS total_overlap,
           max(ratio) AS max_ratio
    FROM scored GROUP BY source
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination report per source: a deterministic
    ~2% hash holdout of ``documents`` plays the eval benchmark; every
    remaining (train) document is scored for word-3-gram overlap
    against it. The per-source rollup pins doc-level verdicts via
    counts + total_overlap + max_ratio.

    The synthetic corpus's duplicates are word-order-shuffled, so
    ratios stay below the 0.5 flag threshold here (max ≈ 0.125 at
    sf0.01) — n_contaminated = 0 is the EXPECTED value and the hash
    still proves the whole overlap computation. Verbatim-copy
    flagging is exercised by the crafted-corpus pytest.
    """
    docs = load(spark, sf_dir, "documents")
    split = F.pmod(
        sample_bucket(F.col("doc_id"), DECON_SALT), F.lit(DECON_HOLDOUT_MOD)
    )
    eval_docs = docs.filter(split == 0)
    train = docs.filter(split != 0)
    scored = contamination_overlap(train, eval_docs)
    return scored.groupBy("source").agg(
        F.count("*").alias("n_train_docs"),
        F.sum(F.when(F.col("n_overlap") > 0, 1).otherwise(0)).alias("n_overlapping"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias("n_contaminated"),
        F.sum("n_overlap").alias("total_overlap"),
        F.max("overlap_ratio").alias("max_ratio"),
    )


# --- the composed cleaning pass: one query, keep/drop + reasons ---

CLEAN_QUALITY_MIN = 0.5  # quality_score floor (textstats weights)
CLEAN_REP_MAX = 0.2  # duplicate-bigram fraction ceiling


@query(
    "q_corpus_clean",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS words,
             length(text) AS doc_len
      FROM documents
    ),
    cuts AS (
      SELECT lang,
             floor(quantile_cont(doc_len, 0.05) * 100 + 0.5) / 100 AS lo,
             floor(quantile_cont(doc_len, 0.95) * 100 + 0.5) / 100 AS hi
      FROM w GROUP BY lang
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words), 2)),
                    i -> array_to_string(words[i:i+1], ' '))) AS gram
      FROM w
    ),
    rep AS (
      SELECT doc_id,
             floor((1.0 - count(DISTINCT gram) * 1.0 / count(*)) * 10000 + 0.5)
               / 10000 AS dup_frac
      FROM g GROUP BY doc_id
    ),
    q AS (
      SELECT doc_id,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct,
             list_sum(list_transform(words, x -> length(x))) AS twc
      FROM w WHERE len(words) > 0
    ),
    quality AS (
      SELECT doc_id,
             floor(((least(n_words * 1.0 / 100, 1.0)) * 0.5
                   + (n_distinct * 1.0 / n_words) * 0.3
                   + (least((twc * 1.0 / n_words) / 10, 1.0)) * 0.2)
                   * 10000 + 0.5) / 10000 AS quality_score
      FROM q
    ),
    verdicts AS (
      SELECT w.doc_id, w.lang,
             concat_ws(',',
               CASE WHEN w.doc_len < c.lo THEN 'too_short' END,
               CASE WHEN w.doc_len > c.hi THEN 'too_long' END,
               CASE WHEN r.dup_frac >= {CLEAN_REP_MAX} THEN 'repetitive' END,
               CASE WHEN qu.quality_score < {CLEAN_QUALITY_MIN} THEN 'low_quality' END
             ) AS reasons
      FROM w
      JOIN cuts c ON w.lang = c.lang
      JOIN rep r ON w.doc_id = r.doc_id
      LEFT JOIN quality qu ON w.doc_id = qu.doc_id
    )
    SELECT doc_id, lang, reasons FROM verdicts WHERE reasons <> ''
    """,
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-cleaning pass — adaptive per-lang length
    band, repetition ceiling, quality floor — in ONE query: dropped
    documents with their comma-joined reason list (reasons as a
    string, not an array, so the hash is representation-stable
    across engines). A user runs this single query instead of
    chaining three filters and reconciling their outputs.

    Scale shape: each signal keeps its own optimal plan (percentile
    agg → broadcast cutoffs; gram explode → two hash aggs; pure
    projection for quality) and they meet in doc_id equi-joins —
    high-cardinality keys, even spread. Nothing is computed twice.
    """
    docs = load(spark, sf_dir, "documents")
    words = F.array_remove(F.split("text", " "), "")
    w = docs.select(
        "doc_id", "lang", words.alias("words"), F.length("text").alias("doc_len")
    )
    cuts = w.groupBy("lang").agg(
        rnd(F.percentile("doc_len", F.lit(0.05))).alias("lo"),
        rnd(F.percentile("doc_len", F.lit(0.95))).alias("hi"),
    )
    grams = w.select(
        "doc_id",
        F.explode(sliding_join(F.col("words"), 2)).alias("gram"),
    )
    rep = (
        grams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(
            rnd(F.lit(1.0) - F.count("*") * 1.0 / F.sum("count"), 4).alias("dup_frac")
        )
    )
    n_words = F.size("words")
    n_distinct = F.size(F.array_distinct("words"))
    twc = F.aggregate(
        F.transform("words", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    quality = (
        w.filter(n_words > 0)
        .select(
            "doc_id",
            rnd(
                F.least(n_words * 1.0 / 100, F.lit(1.0)) * 0.5
                + (n_distinct * 1.0 / n_words) * 0.3
                + F.least((twc * 1.0 / n_words) / 10, F.lit(1.0)) * 0.2,
                4,
            ).alias("quality_score"),
        )
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("doc_len") < F.col("lo"), "too_short"),
        F.when(F.col("doc_len") > F.col("hi"), "too_long"),
        F.when(F.col("dup_frac") >= CLEAN_REP_MAX, "repetitive"),
        F.when(F.col("quality_score") < CLEAN_QUALITY_MIN, "low_quality"),
    )
    return (
        w.join(F.broadcast(cuts), "lang")
        .join(rep, "doc_id")
        .join(quality, "doc_id", "left")
        .select("doc_id", "lang", reasons.alias("reasons"))
        .filter(F.col("reasons") != "")
    )
