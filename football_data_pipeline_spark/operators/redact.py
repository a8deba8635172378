"""PII redaction — the enforcement half of prep.py's ``pii_scan``
(which only counts). Rewrites matched spans with typed placeholder
tokens, the standard pre-training treatment for emails and
phone-shaped strings.

Scale notes: a redaction pass is a pure projection — two
``regexp_replace`` calls inside the scan's codegen stage, no
shuffle, no UDF. At 100 TB this is the cheapest possible shape:
the regex engine runs JVM-side per partition and the parquet scan
prunes to the consumed columns. The output filter (flagged docs
only) is likewise a scan-stage predicate.

The synthetic corpus contains zero PII-shaped strings (verified at
sf0.01 and sf0.1), so the oracle query SEEDS deterministic PII spans
— an email into every doc_id % 3 == 0, a phone into every
doc_id % 4 == 0, via the identical expression in both engines —
then redacts. This keeps the correctness gate exercising the actual
replacement path (non-identity rewrites, non-zero counters) instead
of vacuously hashing empty output. ``redact_pii`` itself takes
whatever text it is given; seeding lives only in the query wrapper.

Patterns are shared with prep.py so scan and redact can never
disagree on what counts as PII.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .prep import EMAIL_RE, PHONE_RE

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document redacted text + hit counters. Emails are
    rewritten before phones so a phone-shaped substring inside an
    already-redacted span can't double-fire; the oracle nests its
    ``regexp_replace`` calls in the same order."""
    n_emails = F.regexp_count(text_col, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(text_col, F.lit(PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        redacted.alias("redacted_text"),
    )


def _seeded_text() -> Column:
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit(" 555-010-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone)


_SEEDED_TEXT_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
"""


@query(
    "q_pii_redact",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, lang, source, {_SEEDED_TEXT_SQL} AS text FROM documents
    )
    SELECT doc_id, lang, source,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
             '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS redacted_text
    FROM seeded
    WHERE len(regexp_extract_all(text, '{EMAIL_RE}'))
          + len(regexp_extract_all(text, '{PHONE_RE}')) > 0
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted text for every flagged document — what a cleaning
    pipeline actually writes back, vs q_pii_scan's report. Runs on
    the deterministically PII-seeded corpus (module docstring)."""
    docs = load(spark, sf_dir, "documents").withColumn("text", _seeded_text())
    out = redact_pii(docs)
    return out.filter(F.col("n_emails") + F.col("n_phones") > 0)
