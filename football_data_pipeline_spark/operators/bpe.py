"""BPE tokenizer training — the merge-learning loop (Sennrich et al.
2016) run in-engine over the corpus word-frequency table, the
data-side half of building a tokenizer for a new corpus.

Key size fact making this tractable on any corpus: BPE trains on the
WORD-FREQUENCY table, not the token stream — after the one corpus
pass that counts words, every merge round touches only vocab-sized
data (≤ millions of rows at web scale). The per-round shape:
1. adjacent symbol pairs, weighted by word count → one hash
   aggregation keyed (lhs, rhs);
2. argmax pair — a TakeOrdered top-1 (per-partition top-1 + driver
   merge of partition winners; no global sort is ever materialized);
3. apply the merge: one literal `replace` over each word's
   space-framed symbol string — greedy leftmost non-overlapping,
   which IS BPE's application order, and byte-identical between
   Spark and DuckDB (verified: ' a a a ' → ' aa a ' in both).

The driver-side loop over K rounds is the same legitimate iterative
pattern as Lloyd's k-means (embedsearch) and label propagation
(dedup.connected_components): each round's plan is vocab-sized and
lazy; K is small by construction. The DuckDB oracle unrolls the same
K rounds as chained CTEs, so the merge table is hash-checked exactly
— ties broken (count DESC, lhs DESC, rhs DESC) on both engines.

Symbols are space-joined with a framing space on both ends so a
merge pair is the literal substring ' lhs rhs ' — no regex, no
boundary ambiguity. '</w>' marks word end (standard BPE), so merges
never cross words and suffix merges stay distinct from prefix ones.

Scale probe (2026-08-14, tools/scale_probe.py, 10× sf0.1 corpus):
q_bpe_merges 1.38s → 1.51s for 10× the tokens — near-FLAT, because
after the word-count pass every round is vocab-bound and the probe's
perturbed copies barely grow the vocabulary. That is the measured
form of the "trains on the word-frequency table" size argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: merge rounds learned by the driver query (a real build runs
#: thousands; the loop and the oracle unroll identically either way)
BPE_ROUNDS = 3

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"


def _bpe_oracle() -> str:
    rounds_sql = []
    prev = "s0"
    selects = []
    for r in range(1, BPE_ROUNDS + 1):
        rounds_sql.append(f"""
    p{r} AS (
      SELECT a[i] AS lhs, a[i + 1] AS rhs, CAST(sum(c) AS BIGINT) AS cnt
      FROM (
        SELECT c, list_filter(string_split(sym, ' '), x -> x <> '') AS a
        FROM {prev}
      ), UNNEST(range(1, len(a))) AS t(i)
      GROUP BY lhs, rhs
    ),
    b{r} AS (
      SELECT lhs, rhs, cnt FROM p{r}
      ORDER BY cnt DESC, lhs DESC, rhs DESC LIMIT 1
    ),
    s{r} AS (
      SELECT c, replace(sym, ' ' || b.lhs || ' ' || b.rhs || ' ',
                        ' ' || b.lhs || b.rhs || ' ') AS sym
      FROM {prev} CROSS JOIN b{r} b
    )""")
        selects.append(
            f"SELECT {r} AS round, lhs, rhs, lhs || rhs AS merged, cnt"
            f" AS pair_count FROM b{r}"
        )
        prev = f"s{r}"
    return f"""
    WITH tok AS (
      SELECT unnest({_WORDS_SQL}) AS w FROM documents
    ),
    w0 AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    s0 AS (
      SELECT c, ' ' || array_to_string(string_split(w, ''), ' ')
               || ' </w> ' AS sym
      FROM w0
    ),{",".join(rounds_sql)}
    {" UNION ALL ".join(selects)}
    """


def bpe_merges(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Learn ``rounds`` BPE merges from the corpus; returns the merge
    table (round, lhs, rhs, merged, pair_count) — the artifact a
    tokenizer build persists. See the module docstring for the scale
    argument and engine-parity contract."""
    spark = docs.sparkSession
    tok = docs.select(
        F.explode(F.array_remove(F.split("text", " "), "")).alias("w")
    )
    w0 = tok.groupBy("w").agg(F.count("*").alias("c"))
    syms = w0.select(
        "c",
        F.concat(
            F.lit(" "),
            F.array_join(F.split("w", ""), " "),
            F.lit(" </w> "),
        ).alias("sym"),
    )
    out: DataFrame | None = None
    for r in range(1, rounds + 1):
        a = F.array_remove(F.split("sym", " "), "")
        pairs = (
            syms.select("c", a.alias("a"))
            .select(
                "c",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("a"), 1, F.greatest(F.size("a") - 1, F.lit(0))),
                        F.slice(
                            F.col("a"),
                            2,
                            F.greatest(F.size("a") - 1, F.lit(0)),
                        ),
                        lambda l, r_: F.struct(l.alias("lhs"), r_.alias("rhs")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("c").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(
            F.desc("cnt"), F.desc("lhs"), F.desc("rhs")
        ).limit(1)
        row = best.select(
            F.lit(r).alias("round"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        syms = syms.crossJoin(F.broadcast(best.select("lhs", "rhs"))).select(
            "c",
            F.replace(
                F.col("sym"),
                F.concat(F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")),
            ).alias("sym"),
        )
    assert out is not None
    return out


@query("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`bpe_merges` over the documents table
    (see the module docstring for semantics and the 100 TB shape)."""
    return bpe_merges(load(spark, sf_dir, "documents"))


def _tokenize_oracle() -> str:
    rounds_sql = []
    prev = "s0"
    for r in range(1, BPE_ROUNDS + 1):
        rounds_sql.append(f"""
    p{r} AS (
      SELECT a[i] AS lhs, a[i + 1] AS rhs, CAST(sum(c) AS BIGINT) AS cnt
      FROM (
        SELECT c, list_filter(string_split(sym, ' '), x -> x <> '') AS a
        FROM {prev}
      ), UNNEST(range(1, len(a))) AS t(i)
      GROUP BY lhs, rhs
    ),
    b{r} AS (
      SELECT lhs, rhs, cnt FROM p{r}
      ORDER BY cnt DESC, lhs DESC, rhs DESC LIMIT 1
    ),
    s{r} AS (
      SELECT w, c, replace(sym, ' ' || b.lhs || ' ' || b.rhs || ' ',
                           ' ' || b.lhs || b.rhs || ' ') AS sym
      FROM {prev} CROSS JOIN b{r} b
    )""")
        prev = f"s{r}"
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    w0 AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    s0 AS (
      SELECT w, c, ' ' || array_to_string(string_split(w, ''), ' ')
                  || ' </w> ' AS sym
      FROM w0
    ),{",".join(rounds_sql)},
    fert AS (
      SELECT w,
             CAST(len(list_filter(string_split(sym, ' '), x -> x <> ''))
                  AS BIGINT) AS n_sub
      FROM {prev}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(f.n_sub) AS BIGINT) AS n_subwords,
           floor((sum(f.n_sub) * 1.0 / count(*)) * 10000 + 0.5) / 10000
             AS fertility
    FROM tok t JOIN fert f ON f.w = t.w
    GROUP BY t.doc_id
    """


def bpe_tokenize_stats(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Apply the learned merges and report per-document subword
    counts and fertility (subwords per word — the tokenizer-quality
    metric a corpus team tracks per language/source).

    Scale shape: merges apply on the WORD-FREQUENCY table (vocab-
    sized), and per-word subword counts broadcast back onto the
    token stream — the same count→broadcast→score pattern as
    lm.lm_score; the token stream is touched exactly twice
    (vocabulary build + scoring join), both linear. The symbol count
    includes the '</w>' marker, matching the merge learner's symbol
    universe.
    """
    tok = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.split("text", " "), "")).alias("w"),
    )
    w0 = tok.groupBy("w").agg(F.count("*").alias("c"))
    syms = w0.select(
        "w",
        "c",
        F.concat(
            F.lit(" "),
            F.array_join(F.split("w", ""), " "),
            F.lit(" </w> "),
        ).alias("sym"),
    )
    for _ in range(rounds):
        a = F.array_remove(F.split("sym", " "), "")
        pairs = (
            syms.select("c", a.alias("a"))
            .select(
                "c",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("a"), 1, F.greatest(F.size("a") - 1, F.lit(0))),
                        F.slice(F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(0))),
                        lambda l, r_: F.struct(l.alias("lhs"), r_.alias("rhs")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("c").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.desc("lhs"), F.desc("rhs")).limit(1)
        syms = syms.crossJoin(F.broadcast(best.select("lhs", "rhs"))).select(
            "w",
            "c",
            F.replace(
                F.col("sym"),
                F.concat(F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")),
            ).alias("sym"),
        )
    fert = syms.select(
        "w",
        F.size(F.array_remove(F.split("sym", " "), "")).cast("long").alias("n_sub"),
    )
    return (
        tok.join(F.broadcast(fert), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
            (
                F.floor(
                    (F.sum("n_sub") * 1.0 / F.count("*")) * 10000 + F.lit(0.5)
                )
                / 10000
            ).alias("fertility"),
        )
    )


@query("q_bpe_tokenize", oracle=_tokenize_oracle())
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`bpe_tokenize_stats` over the documents
    table (see that docstring for semantics and the 100 TB shape)."""
    return bpe_tokenize_stats(load(spark, sf_dir, "documents"))
