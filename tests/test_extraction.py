"""HTML extraction: strip rules, single-pass entity decode, the
local boilerplate-line heuristic, and the escape round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.extraction import (
    MIN_CONTENT_WORDS,
    drop_boilerplate_lines,
    escape_html,
    extract_documents,
    extract_text,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_text(F.col("html")).alias("t")).collect()[0].t


def _clean(spark, html: str):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        drop_boilerplate_lines(extract_text(F.col("html"))).alias("s")
    ).collect()[0].s


def test_script_style_comment_blocks_removed(spark):
    got = _extract(
        spark,
        "<p>keep</p><script>var a = 1 < 2; s = '</div>';</script>"
        "<style>p { color: red; }</style><!-- secret -->",
    )
    assert "keep" in got
    for leaked in ("var a", "color", "secret", "</div>"):
        assert leaked not in got


def test_block_tags_become_lines_inline_tags_do_not(spark):
    got = _extract(
        spark, "<DIV>one</DIV><p class='x'>two</p><b>bold</b> tail"
    )
    lines = [l.strip() for l in got.split("\n") if l.strip()]
    assert lines == ["one", "two", "bold  tail"] or lines == [
        "one",
        "two",
        "bold tail",
    ]


def test_entities_decode_exactly_once(spark):
    # &amp;lt; must become the LITERAL text "&lt;", never "<"
    got = _extract(spark, "<p>a &amp;lt; b &lt; c &amp; d</p>")
    assert "a &lt; b < c & d" in got


def test_escape_extract_round_trip(spark):
    raw = 'a & b < c > d "quoted" &amp; pre-escaped'
    df = spark.createDataFrame([(raw,)], "t string")
    html = df.select(
        F.concat(F.lit("<p>"), escape_html(F.col("t")), F.lit("</p>")).alias(
            "html"
        )
    )
    got = html.select(extract_text(F.col("html")).alias("o")).collect()[0].o
    assert got.strip() == raw


def test_boilerplate_word_threshold_boundary(spark):
    five = " ".join(["w"] * MIN_CONTENT_WORDS)
    four = " ".join(["w"] * (MIN_CONTENT_WORDS - 1))
    s = _clean(spark, f"<p>{five}</p><p>{four}</p><p></p>")
    assert s.clean_text == five
    assert s.n_lines_kept == 1
    # the empty <p></p> line is a formatting artifact, not a line
    assert s.n_lines_dropped == 1


def test_multiline_content_order_preserved(spark):
    a = "alpha beta gamma delta epsilon"
    b = "one two three four five six"
    s = _clean(spark, f"<div>{a}</div><div>{b}</div>")
    assert s.clean_text == f"{a}\n{b}"
    assert s.n_lines_kept == 2 and s.n_lines_dropped == 0


def test_whitespace_normalized_within_lines(spark):
    s = _clean(spark, "<p>  spaced   out\tcontent  here   now </p>")
    assert s.clean_text == "spaced out content here now"


def test_extract_documents_contract(spark):
    df = spark.createDataFrame(
        [(1, "<p>alpha beta gamma delta epsilon</p>", "en")],
        "doc_id long, html string, lang string",
    )
    out = extract_documents(df)
    assert sorted(out.columns) == [
        "clean_text",
        "doc_id",
        "lang",
        "n_lines_dropped",
        "n_lines_kept",
    ]
    r = out.collect()[0]
    assert r.clean_text == "alpha beta gamma delta epsilon"
    assert r.lang == "en"
