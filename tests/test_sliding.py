"""functions/sliding.py: the capture-free window kernels must be
byte-identical to the naive transform-over-sequence-with-slice form
they replace (which is O(len²) once CollapseProject inlines the
captured array — see the module docstring), including the partial
final windows and the empty-input edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.functions.sliding import (
    chunked_join,
    sliding_join,
    sliding_min,
)

TEXTS = [
    "a b c d e f g",
    "a b c",
    "a b",
    "a",
    "",
    "  double  spaced  ",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11",
]


def _ws():
    return F.array_remove(F.split("text", " "), "")


def test_sliding_join_matches_naive(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    for k in (2, 3, 4):
        naive = F.expr(
            f"transform(sequence(1, greatest(size(ws) - {k - 1}, 1)), "
            f"i -> concat_ws(' ', slice(ws, i, {k})))"
        )
        rows = (
            df.select(_ws().alias("ws"))
            .select(sliding_join(F.col("ws"), k).alias("zip"), naive.alias("naive"))
            .collect()
        )
        for r in rows:
            assert r.zip == r.naive, (k, r.zip, r.naive)


def test_sliding_min_matches_naive(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    for w in (2, 4):
        naive = F.expr(
            f"transform(sequence(1, greatest(size(hs) - {w - 1}, 1)), "
            f"i -> array_min(slice(hs, i, {w})))"
        )
        rows = (
            df.select(_ws().alias("ws"))
            .select(F.transform("ws", lambda t: F.md5(t)).alias("hs"))
            .select(sliding_min(F.col("hs"), w).alias("zip"), naive.alias("naive"))
            .collect()
        )
        for r in rows:
            assert r.zip == r.naive, (w, r.zip, r.naive)


def test_chunked_join_stride_semantics(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    rows = (
        df.select("text", _ws().alias("ws"))
        .select("text", chunked_join(F.col("ws"), 3).alias("chunks"))
        .collect()
    )
    for r in rows:
        words = [x for x in r.text.split(" ") if x]
        expect = [
            " ".join(words[i : i + 3]) for i in range(0, len(words), 3)
        ]
        assert r.chunks == expect, (r.text, r.chunks, expect)
