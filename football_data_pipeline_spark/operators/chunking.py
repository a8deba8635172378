"""RAG-style document chunking: overlapping fixed-size word windows
with provenance offsets — the retrieval-prep pass that sits between
cleaning (prep.py) and embedding (embedsearch.py) in a training /
retrieval corpus pipeline.

Reference parity: none — the reference has no long-document
processing; this is part of the LLM-data-pipeline extension block
(SURVEY.md §2).

Chunk geometry: windows of CHUNK_WORDS words starting every
STRIDE_WORDS words (overlap = CHUNK_WORDS − STRIDE_WORDS). A
document with n ≤ CHUNK_WORDS words is exactly one chunk; otherwise
⌈(n − CHUNK_WORDS)/STRIDE_WORDS⌉ + 1 chunks, so the last window
always reaches the final word and no two windows are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

CHUNK_WORDS = 40
STRIDE_WORDS = 30

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"


def _chunking_oracle() -> str:
    c, s = CHUNK_WORDS, STRIDE_WORDS
    return f"""
    WITH w AS (
      SELECT doc_id, lang, {_WORDS_SQL} AS ws FROM documents
    ),
    sized AS (
      SELECT doc_id, lang, ws, len(ws) AS n,
             CASE WHEN len(ws) <= {c} THEN 1
                  ELSE CAST(ceil((len(ws) - {c}) / {s}.0) AS INT) + 1
             END AS n_chunks
      FROM w WHERE len(ws) > 0
    )
    SELECT doc_id, lang,
           i AS chunk_idx,
           CAST(i * {s} AS BIGINT) AS start_word,
           CAST(least({c}, n - i * {s}) AS BIGINT) AS n_words,
           array_to_string(list_slice(ws, i * {s} + 1, i * {s} + {c}), ' ')
             AS chunk_text
    FROM sized, UNNEST(range(0, n_chunks)) AS t(i)
    """


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Explode each document into its overlapping chunk windows with
    (chunk_idx, start_word, n_words) provenance — the columns a
    retrieval index needs to map a hit back into the source span.

    Scale shape: narrow end to end — split, a codegen generator
    (posexplode over the chunk-index sequence), and a per-row slice
    + join. No shuffle at all: chunking is embarrassingly parallel
    and the output keeps the input's partitioning, so the downstream
    embed/index stage starts from co-located chunks. Per-row cost is
    O(n_chunks · CHUNK) = O(n · CHUNK/STRIDE) — linear in document
    length, not the O(n²) lambda-capture shape sliding.py exists to
    avoid (the slice is taken AFTER the explode, so each output row
    materializes only its own window).
    """
    c, s = CHUNK_WORDS, STRIDE_WORDS
    sized = (
        docs.select(
            "doc_id", "lang", F.array_remove(F.split("text", " "), "").alias("ws")
        )
        .withColumn("n", F.size("ws"))
        .filter(F.col("n") > 0)
        .withColumn(
            "n_chunks",
            F.when(F.col("n") <= c, F.lit(1)).otherwise(
                F.ceil((F.col("n") - c) / float(s)).cast("int") + 1
            ),
        )
    )
    return (
        sized.select(
            "doc_id",
            "lang",
            "ws",
            "n",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_idx", "__i"
            ),
        )
        .select(
            "doc_id",
            "lang",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * s).cast("long").alias("start_word"),
            F.least(F.lit(c), F.col("n") - F.col("chunk_idx") * s)
            .cast("long")
            .alias("n_words"),
            F.array_join(
                F.slice(F.col("ws"), F.col("chunk_idx") * s + 1, c), " "
            ).alias("chunk_text"),
        )
    )


@query("q_chunking", oracle=_chunking_oracle())
def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`chunk_documents` over the documents
    table (see that docstring for semantics and the 100 TB shape)."""
    return chunk_documents(load(spark, sf_dir, "documents"))
