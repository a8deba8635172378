"""Gopher repetition filters: the HOF run-length fold matches a
pure-Python reference on randomized word soups, hand-built documents
produce hand-computed stats, thresholds are integer-exact at the
boundary, degenerate docs degrade to zeros, and the whole query plan
contains zero exchanges (the module's headline scale claim)."""

from __future__ import annotations

import io
import contextlib
import random
from collections import Counter

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.repetition import (
    DUP_LINE_PCT,
    DUP_NGRAM_PCT,
    RULE_NAMES,
    TOP_NGRAM_PCT,
    repetition_gate,
    repetition_stats,
    synth_lined_docs,
)


def _py_stats(text: str) -> dict[str, int]:
    """Independent Python reference for the stated definitions."""
    paras = [p for p in text.split("\n\n") if p]
    lines = [l for l in text.split("\n") if l]
    words = [w for w in text.replace("\n", " ").split(" ") if w]

    def unit_stats(units: list[str], sep: int) -> tuple[int, int, int]:
        cnt = Counter(units)
        dup_units = sum(c for c in cnt.values() if c >= 2)
        dup_chars = sum(
            c * (len(u) - sep) for u, c in cnt.items() if c >= 2
        )
        top = max(
            ((c, c * (len(u) - sep)) for u, c in cnt.items()),
            default=(0, 0),
        )
        return dup_units, dup_chars, top[1]

    out = {
        "n_words": len(words),
        "total_wchars": sum(len(w) for w in words),
        "n_lines": len(lines),
        "total_lchars": sum(len(l) for l in lines),
        "n_paras": len(paras),
        "total_pchars": sum(len(p) for p in paras),
    }
    out["dup_line_cnt"], out["dup_line_chars"], _ = unit_stats(lines, 0)
    out["dup_para_cnt"], out["dup_para_chars"], _ = unit_stats(paras, 0)
    for n in sorted(TOP_NGRAM_PCT):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        _, _, out[f"top{n}_prod"] = unit_stats(grams, n - 1)
    for n in sorted(DUP_NGRAM_PCT):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        _, out[f"dup{n}_chars"], _ = unit_stats(grams, n - 1)
    return out


def _stats_row(spark, text: str) -> dict:
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0].asDict()


def test_hof_fold_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dd"]
    for trial in range(12):
        n = rng.randint(0, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        # random line structure: break after every 3-6 words,
        # occasional blank line for a paragraph split
        parts, i = [], 0
        while i < len(words):
            k = rng.randint(3, 6)
            parts.append(" ".join(words[i : i + k]))
            i += k
        sep = ["\n" if rng.random() < 0.7 else "\n\n" for _ in parts]
        text = "".join(p + s for p, s in zip(parts, sep))
        got = _stats_row(spark, text)
        want = _py_stats(text)
        for k, v in want.items():
            assert got[k] == v, f"trial {trial} col {k}: {got[k]} != {v}"


def test_hand_computed_document(spark):
    # 2 identical lines of 2-word content + 1 unique, one dup paragraph
    text = "a b\na b\n\nc d\n\na b\na b"
    got = _stats_row(spark, text)
    assert got["n_lines"] == 5 and got["dup_line_cnt"] == 4
    assert got["dup_line_chars"] == 4 * 3
    assert got["n_paras"] == 3 and got["dup_para_cnt"] == 2
    assert got["dup_para_chars"] == 2 * 7  # "a b\na b" is 7 chars
    # words: a b a b c d a b a b -> top 2-gram "a b" x4, weight 2
    assert got["top2_prod"] == 4 * 2
    assert got["n_words"] == 10 and got["total_wchars"] == 10


def test_top_gram_tie_breaks_on_product(spark):
    # "aa aa" and "b b" both occur twice as 2-grams; tie must pick
    # the larger count x weight product deterministically
    text = "aa aa aa b b b"
    got = _stats_row(spark, text)
    # 2-grams: "aa aa" x2, "aa b" x1, "b b" x2 -> tie (2,8) vs (2,4)
    assert got["top2_prod"] == 2 * 4


def test_empty_and_tiny_docs_degrade_to_zero(spark):
    for text in ["", "solo", "a b c"]:
        got = _stats_row(spark, text)
        assert got["dup10_chars"] == 0 and got["top4_prod"] >= 0
        gated = repetition_gate(
            repetition_stats(
                spark.createDataFrame([(0, text)], "doc_id long, text string")
            )
        ).collect()[0]
        if text == "":
            assert gated["passes"]  # 0 <= 0 on every rule


def test_oracle_parity_with_zero_word_document(spark, tmp_path):
    """ADVICE r10: a zero-word doc yields no units rows, hence no
    piv row in the oracle — the LEFT JOIN must coalesce the stats to
    0 (as the operator emits), not leak NULLs into n_fail/passes.
    Full Spark-vs-DuckDB parity over a fixture that PLANTS the empty
    and whitespace-only docs the shipped testdata happens to lack."""
    import duckdb

    from football_data_pipeline_spark.operators.repetition import (
        q_gopher_repetition,
    )
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import assert_matches_oracle

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kap"),
            (2, ""),
            (3, "   "),
            (4, "dup dup dup dup dup dup dup dup dup dup dup dup"),
        ],
        "doc_id long, text string",
    )
    docs.toPandas().to_parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        assert_matches_oracle(
            q_gopher_repetition(spark, str(tmp_path)),
            con,
            QUERIES["q_gopher_repetition"].oracle,
            name="q_gopher_repetition(zero-word fixture)",
            expect_nonempty=True,
        )
    finally:
        con.close()


def test_threshold_boundary_is_integer_exact(spark):
    # exactly 30% duplicate lines: 3 of 10 -> passes; 4 of 10 fails
    def doc(n_dup: int) -> str:
        uniq = [f"u{i} v{i}" for i in range(10 - n_dup)]
        return "\n".join(["x y"] * n_dup + uniq)

    df = spark.createDataFrame(
        [(0, doc(3)), (1, doc(4))], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_gate(repetition_stats(df)).collect()
    }
    assert rows[0]["r_dup_line"]
    assert not rows[1]["r_dup_line"]
    assert rows[0]["dup_line_cnt"] * 100 == DUP_LINE_PCT * rows[0]["n_lines"]


def test_gate_rule_columns_complete(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    cols = set(repetition_gate(repetition_stats(df)).columns)
    for name in RULE_NAMES:
        assert f"r_{name}" in cols
    assert {"n_fail", "passes"} <= cols


def test_synth_fixture_chunks_exactly(spark):
    words = [f"w{i}" for i in range(23)]  # 5 lines, 2 paras
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    text = synth_lined_docs(df).collect()[0]["text"]
    paras = text.split("\n\n")
    assert len(paras) == 2
    lines = [l for p in paras for l in p.split("\n")]
    assert len(lines) == 5
    assert lines[0] == "w0 w1 w2 w3 w4" and lines[4] == "w20 w21 w22"
    assert [len(p.split("\n")) for p in paras] == [3, 2]


def test_query_plan_shuffles_nothing_data_dependent(spark):
    # the fold itself is map-only; the query's ONLY exchange is the
    # round-robin input spread (a testdata-layout workaround — a
    # many-file production input needs none)
    from football_data_pipeline_spark.operators.repetition import (
        q_gopher_repetition,
    )

    df = q_gopher_repetition(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "roundrobin" in plan.lower()
    assert "hashpartitioning" not in plan.lower()


def test_operator_alone_has_zero_exchanges(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    out = repetition_gate(repetition_stats(synth_lined_docs(df)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_grams_kernel_matches_naive_slice_form(spark):
    """The r13 arrays_zip gram builder must be element-identical to
    the naive transform-over-sequence-with-slice form it replaced —
    including the [] degrade for docs shorter than n and the
    exact-length boundary (size == n -> one gram)."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.operators.repetition import _grams

    cases = ["", "a", "a b", "a b c", "a b c d", "x " * 9 + "y"]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    words = F.array_remove(F.split("text", "[ \n]+"), "")
    for n in (2, 3, 5, 10):
        got = [
            r.g
            for r in df.select(_grams(words, n).alias("g"))
            .collect()
        ]
        for text, g in zip(cases, got):
            ws = [w for w in text.split(" ") if w]
            want = (
                [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
                if len(ws) >= n
                else []
            )
            assert g == want, (text, n, g, want)
