"""HTML → text extraction — the step a crawl pipeline runs BEFORE
every text pass this engine already has (quality gates, dedup,
decontamination all assume clean text). Reference parity: none —
LLM-data-pipeline extension (SURVEY.md §2 scale extensions; the
C4/CCNet "text extraction + local boilerplate drop" stage).

Two composable pieces, both pure projections (map-only, zero
exchanges, whole-stage codegen — built-in regexp/HOF only, no UDF):

- ``extract_text``: strip <script>/<style>/comment blocks, turn
  block-level tags into line breaks (so document STRUCTURE survives
  as lines), strip remaining tags, decode the six standard entities
  (&amp; LAST — a single decode pass, so pre-escaped text
  round-trips instead of double-decoding), collapse whitespace.
- ``drop_boilerplate_lines``: per-line LOCAL content heuristic —
  keep lines with ≥ MIN_CONTENT_WORDS words; nav bars, titles,
  copyright footers and menu crumbs die here. This is deliberately
  only the LOCAL half of boilerplate removal: the corpus-frequency
  half (a footer shared by a million pages) is dedup.line_dedup's
  job, which composes downstream — the two halves stay separate
  because the local rule needs no shuffle at all.

The driver fixture (``synth_html_docs``) wraps every document in a
deterministic page template — head/title, style + script blocks, a
nav div, an h1, the document text entity-ESCAPED inside a <p> with
a fixed entity-bearing sentence, a footer — so the expected clean
output is CLOSED-FORM in the original text: exactly one content
line, four boilerplate lines, entities restored. The oracle derives
that expectation independently from documents.text (never
re-running the regex chain), so a drift in any strip rule, the
entity order, or the line heuristic breaks the value hash.

100 TB shape: both pieces are scan-cost projections; the only state
is the regex chain itself. Real-world HTML needs a real parser for
pathological markup — this is the deterministic, engine-portable
90% pass; plug a Pandas-UDF parser behind the same column contract
when the corpus demands it.

10x probe (documents replicated 10x, 5k -> 50k docs, medians of 3):
q_html_extract 0.80 -> 1.16 s — sub-linear; the regex chain is
map-only and partition-parallel, wall tracks the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: a line with fewer words than this is local boilerplate
MIN_CONTENT_WORDS = 5

#: entity decode table, applied in order — &amp; strictly LAST so a
#: single pass never double-decodes
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

#: tags that imply a line break when they open OR close
_BLOCK_TAGS = "p|div|br|h[1-6]|li|tr|table|ul|ol|section|article|header|footer"


def escape_html(col: Column) -> Column:
    """Entity-escape text for embedding in markup (& first, the
    exact inverse of extract_text's decode order)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for raw, ent in [("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]:
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def extract_text(html: Column) -> Column:
    """Clean multi-line text from an HTML column (module docstring
    has the rule order). Every rule is a built-in regexp — one
    projection, no UDF."""
    out = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, raw in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(raw))
    return out


def _line_words(line) -> Column:
    return F.filter(F.split(line, " "), lambda w: w != F.lit(""))


def drop_boilerplate_lines(
    text: Column, min_words: int = MIN_CONTENT_WORDS
) -> Column:
    """struct(clean_text, n_lines_kept, n_lines_dropped): lines with
    ≥ min_words words survive (whitespace-normalized), shorter
    NON-empty lines are counted as dropped; empty lines are
    formatting artifacts of the tag strip, not lines."""
    lines = F.transform(
        F.split(text, "\n"),
        lambda l: F.trim(F.regexp_replace(l, r"\s+", " ")),
    )
    kept = F.filter(
        lines, lambda l: F.size(_line_words(l)) >= F.lit(min_words)
    )
    nonempty = F.filter(lines, lambda l: l != F.lit(""))
    return F.struct(
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        (F.size(nonempty) - F.size(kept)).alias("n_lines_dropped"),
    )


def extract_documents(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = MIN_CONTENT_WORDS,
) -> DataFrame:
    """``df`` minus the HTML column, plus (clean_text, n_lines_kept,
    n_lines_dropped) — the full extraction pass as one projection."""
    s = drop_boilerplate_lines(extract_text(F.col(html_col)), min_words)
    return df.withColumn("__s", s).select(
        *[c for c in df.columns if c != html_col],
        F.col("__s.clean_text").alias("clean_text"),
        F.col("__s.n_lines_kept").alias("n_lines_kept"),
        F.col("__s.n_lines_dropped").alias("n_lines_dropped"),
    )


#: the fixed entity-bearing sentence planted in every synthetic page
#: (raw form — what extraction must restore)
_SENTENCE_RAW = 'Tom & Jerry <3 "quoted" entities decode exactly once:'


def synth_html_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, html): every document wrapped in the deterministic
    page template (module docstring) — title/nav/h1/footer are
    boilerplate-short by construction, the single <p> carries the
    entity-escaped fixed sentence + the escaped, whitespace-
    normalized document text."""
    body = escape_html(
        F.concat(
            F.lit(_SENTENCE_RAW + " "),
            F.trim(
                F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"\s+", " ")
            ),
        )
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>body { color: #000; }</style>"
            "<script>var x = 1 < 2 && 3 > 2;</script></head><body>"
            "<!-- generated page -->"
            '<div class="nav">Home About Contact</div>'
            "<h1>Page "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        body,
        F.lit('</p><div class="footer">Copyright 2026</div></body></html>'),
    )
    return docs.select("doc_id", html.alias("html"))


def _extract_oracle() -> str:
    # the expected output derived INDEPENDENTLY from documents.text:
    # the template yields exactly one content line (the planted
    # sentence + the normalized text — entities restored) and four
    # boilerplate lines (title, nav, h1, footer), without re-running
    # any strip rule
    sent = _SENTENCE_RAW.replace("'", "''")
    return f"""
    SELECT doc_id,
           trim('{sent}' || ' ' ||
                trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))
             AS clean_text,
           CAST(1 AS INTEGER) AS n_lines_kept,
           CAST(4 AS INTEGER) AS n_lines_dropped
    FROM documents
    """


@query("q_html_extract", oracle=_extract_oracle())
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML text extraction end-to-end: wrap every document in the
    deterministic page template (script/style/comment blocks, nav,
    headings, footer, entity-escaped body), run the REAL strip +
    decode + boilerplate-line chain, return (doc_id, clean_text,
    n_lines_kept, n_lines_dropped). The oracle states the closed-form
    expectation straight from documents.text."""
    docs = load(spark, sf_dir, "documents")
    return extract_documents(synth_html_docs(docs))
