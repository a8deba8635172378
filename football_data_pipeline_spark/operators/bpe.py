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
   SENTINEL-FRAMED symbol string (below) — canonical BPE greedy
   leftmost non-overlapping application, byte-identical between
   Spark and DuckDB.

Symbol representation: every symbol is framed as ``\\x01sym\\x02``
and symbols are concatenated with NO shared separator. The merge
pair (lhs, rhs) is then the literal substring
``\\x01lhs\\x02\\x01rhs\\x02`` and its replacement
``\\x01lhsrhs\\x02``. Because adjacent matches share no characters,
left-to-right non-overlapping `replace` merges EVERY eligible
occurrence in one pass — including back-to-back runs: 'aaaa' with
merge (a,a) → [aa][aa], exactly Sennrich/HF application order. (The
earlier space-separated form ' lhs rhs ' consumed the shared
boundary space, skipped every other occurrence in a run, and
silently diverged from canonical BPE on words like '!!!!' — the
framing fix is why the sentinels exist.) The sentinels are stripped
from input words first (a production build byte-encodes its
alphabet, making the collision impossible by construction).

The driver-side loop over K rounds is the same legitimate iterative
pattern as Lloyd's k-means (embedsearch) and label propagation
(dedup.connected_components): each round's plan is vocab-sized and
lazy; K is small by construction. The DuckDB oracle unrolls the same
K rounds as chained CTEs through a SHARED round-builder, so the
learner (q_bpe_merges) and the tokenizer (q_bpe_tokenize) can never
drift apart — one definition of a round serves both queries in both
engines. Ties break (count DESC, lhs DESC, rhs DESC) everywhere.

Scale probe (2026-08-14, tools/scale_probe.py, 10× sf0.1 corpus):
q_bpe_merges 1.38s → 1.51s for 10× the tokens — near-FLAT, because
after the word-count pass every round is vocab-bound and the probe's
perturbed copies barely grow the vocabulary. That is the measured
form of the "trains on the word-frequency table" size argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: merge rounds learned by the driver query (a real build runs
#: thousands; the loop and the oracle unroll identically either way)
BPE_ROUNDS = 3

#: symbol framing sentinels (module docstring) — chr(1)/chr(2),
#: outside any text alphabet and stripped from input defensively
SL = "\x01"
SR = "\x02"

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"
#: words with sentinels stripped (defensive; see module docstring)
_CLEAN_W_SQL = "replace(replace(w, chr(1), ''), chr(2), '')"
#: symbol array from a framed string: drop the outer frame, split on
#: the inter-symbol boundary
_SYMS_SQL = (
    "string_split(sym[2:length(sym) - 1], chr(2) || chr(1))"
)


def _frame_sql(word_expr: str) -> str:
    """SQL: char-split ``word_expr``, append '</w>', frame each
    symbol with the sentinels."""
    return (
        f"chr(1) || array_to_string(string_split({word_expr}, ''), "
        "chr(2) || chr(1)) || chr(2) || chr(1) || '</w>' || chr(2)"
    )


def _round_ctes(r: int, prev: str) -> str:
    """One shared merge round as SQL CTEs (p{r}: weighted pair
    counts, b{r}: argmax, s{r}: merge applied). The ONLY definition
    of a round on the oracle side — both queries' oracles chain it."""
    return f"""
    p{r} AS (
      SELECT a[i] AS lhs, a[i + 1] AS rhs, CAST(sum(c) AS BIGINT) AS cnt
      FROM (SELECT c, {_SYMS_SQL} AS a FROM {prev}),
           UNNEST(range(1, len(a))) AS t(i)
      GROUP BY lhs, rhs
    ),
    b{r} AS (
      -- the chr(0) sentinel mirrors the Spark no-op row: a round
      -- with no pairs must carry the vocab through unchanged, not
      -- annihilate it via the CROSS JOIN with an empty argmax
      SELECT lhs, rhs, cnt FROM (
        SELECT lhs, rhs, cnt FROM p{r}
        UNION ALL SELECT chr(0), chr(0), CAST(0 AS BIGINT)
      ) ORDER BY cnt DESC, lhs DESC, rhs DESC LIMIT 1
    ),
    s{r} AS (
      SELECT w, c,
             replace(sym,
                     chr(1) || b.lhs || chr(2) || chr(1) || b.rhs || chr(2),
                     chr(1) || b.lhs || b.rhs || chr(2)) AS sym
      FROM {prev} CROSS JOIN b{r} b
    )"""


def _base_ctes(carry_doc: bool) -> str:
    doc_col = "doc_id, " if carry_doc else ""
    return f"""
    WITH tok AS (
      SELECT {doc_col}{_CLEAN_W_SQL} AS w
      FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents)
    ),
    w0 AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    s0 AS (SELECT w, c, {_frame_sql('w')} AS sym FROM w0)"""


def _bpe_oracle() -> str:
    parts = [_base_ctes(carry_doc=False)]
    selects = []
    prev = "s0"
    for r in range(1, BPE_ROUNDS + 1):
        parts.append("," + _round_ctes(r, prev))
        selects.append(
            f"SELECT {r} AS round, lhs, rhs, lhs || rhs AS merged, cnt"
            f" AS pair_count FROM b{r} WHERE cnt > 0"
        )
        prev = f"s{r}"
    return "".join(parts) + "\n    " + " UNION ALL ".join(selects)


def _tokenize_oracle() -> str:
    parts = [_base_ctes(carry_doc=True)]
    prev = "s0"
    for r in range(1, BPE_ROUNDS + 1):
        parts.append("," + _round_ctes(r, prev))
        prev = f"s{r}"
    return (
        "".join(parts)
        + f""",
    fert AS (
      SELECT w, CAST(len({_SYMS_SQL}) AS BIGINT) AS n_sub FROM {prev}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(f.n_sub) AS BIGINT) AS n_subwords,
           floor((sum(f.n_sub) * 1.0 / count(*)) * 10000 + 0.5) / 10000
             AS fertility
    FROM tok t JOIN fert f ON f.w = t.w
    GROUP BY t.doc_id
    """
    )


def _clean_words(docs: DataFrame, carry_doc: bool) -> DataFrame:
    cleaned = F.replace(
        F.replace(F.col("w"), F.lit(SL), F.lit("")), F.lit(SR), F.lit("")
    ).alias("w")
    carried = ["doc_id"] if carry_doc else []
    return docs.select(
        *carried, F.explode(F.array_remove(F.split("text", " "), "")).alias("w")
    ).select(*carried, cleaned)


def _framed_vocab(tok: DataFrame) -> DataFrame:
    """(w, c, sym): word counts with the sentinel-framed symbol
    string (chars + '</w>')."""
    sym = F.concat(
        F.lit(SL),
        F.array_join(F.split("w", ""), SR + SL),
        F.lit(SR),
        F.lit(SL + "</w>" + SR),
    )
    return tok.groupBy("w").agg(F.count("*").alias("c")).select(
        "w", "c", sym.alias("sym")
    )


def _syms_array() -> Column:
    """Symbol array from the framed string (strip outer frame, split
    on the inter-symbol boundary)."""
    return F.split(F.expr("substring(sym, 2, length(sym) - 2)"), SR + SL)


def _one_round(syms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One shared merge round: returns (best — 1 row of lhs/rhs/cnt,
    syms with the merge applied). The ONLY definition of a round on
    the Spark side, used by both the learner and the tokenizer."""
    a = _syms_array()
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
    # pad with a zero-count sentinel no-merge row: if a round finds
    # NO pairs (vocab fully merged early), an empty `best` would
    # annihilate the vocabulary through the crossJoin — the sentinel
    # (chr(0) is never a symbol) keeps the round a no-op instead.
    # Any real pair (cnt >= 1) outranks it; bpe_merges filters the
    # sentinel out of the merge table.
    noop = syms.sparkSession.createDataFrame(
        [("\x00", "\x00", 0)], "lhs string, rhs string, cnt long"
    )
    best = (
        pairs.unionByName(noop)
        .orderBy(F.desc("cnt"), F.desc("lhs"), F.desc("rhs"))
        .limit(1)
    )
    applied = syms.crossJoin(F.broadcast(best.select("lhs", "rhs"))).select(
        "w",
        "c",
        F.replace(
            F.col("sym"),
            F.concat(
                F.lit(SL), F.col("lhs"), F.lit(SR), F.lit(SL), F.col("rhs"), F.lit(SR)
            ),
            F.concat(F.lit(SL), F.col("lhs"), F.col("rhs"), F.lit(SR)),
        ).alias("sym"),
    )
    return best, applied


def bpe_merges(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Learn ``rounds`` BPE merges from the corpus; returns the merge
    table (round, lhs, rhs, merged, pair_count) — the artifact a
    tokenizer build persists. See the module docstring for the scale
    argument and engine-parity contract."""
    syms = _framed_vocab(_clean_words(docs, carry_doc=False))
    out: DataFrame | None = None
    for r in range(1, rounds + 1):
        best, syms = _one_round(syms)
        row = best.select(
            F.lit(r).alias("round"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out.filter(F.col("pair_count") > 0)


@query("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`bpe_merges` over the documents table
    (see the module docstring for semantics and the 100 TB shape)."""
    return bpe_merges(load(spark, sf_dir, "documents"))


def bpe_tokenize_stats(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Apply the learned merges and report per-document subword
    counts and fertility (subwords per word — the tokenizer-quality
    metric a corpus team tracks per language/source).

    Scale shape: merges apply on the WORD-FREQUENCY table (vocab-
    sized), and per-word subword counts join back onto the token
    stream — the same count→join→score pattern as lm.lm_score (no
    forced broadcast: AQE picks broadcast for a small vocab and
    falls back to a shuffle join for a web-scale one); the token
    stream is touched exactly twice (vocabulary build + scoring
    join), both linear. The symbol count includes the '</w>' marker,
    matching the merge learner's symbol universe — and the rounds
    themselves ARE the learner's rounds (shared `_one_round`), so
    the applied merges equal the persisted merge table by
    construction.
    """
    tok = _clean_words(docs, carry_doc=True)
    syms = _framed_vocab(tok.select("w"))
    for _ in range(rounds):
        _, syms = _one_round(syms)
    fert = syms.select(
        "w", F.size(_syms_array()).cast("long").alias("n_sub")
    )
    return (
        tok.join(fert, "w")
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
