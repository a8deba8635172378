"""Gopher rule gate: every threshold is integer-exact, so the
boundary document must classify identically everywhere — these tests
pin each rule at its exact boundary and one step past it."""

from __future__ import annotations

from football_data_pipeline_spark.operators.rules import (
    MIN_WORDS,
    RULE_NAMES,
    gopher_gate,
)

# a base document that passes every rule: 50 four-char alpha words
# including two stopwords
BASE = "the and " + " ".join(["word"] * (MIN_WORDS - 2))


def _gate_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_gate(df).collect()[0]


def test_base_document_passes_all_rules(spark):
    r = _gate_one(spark, BASE)
    assert r.passes
    assert all(r[f"r_{k}"] for k in RULE_NAMES)


def test_word_count_boundaries(spark):
    # exactly MIN_WORDS passes; one fewer fails word_count only
    assert _gate_one(spark, BASE).r_word_count
    short = "the and " + " ".join(["word"] * (MIN_WORDS - 3))
    r = _gate_one(spark, short)
    assert not r.r_word_count and not r.passes
    assert r.r_mean_word_len and r.r_stopwords


def test_mean_word_len_boundaries(spark):
    # 50 words of exactly 3 chars -> mean 3.0 passes (inclusive)
    ok = "the abc " + " ".join(["abc"] * (MIN_WORDS - 2))
    assert _gate_one(spark, ok).r_mean_word_len
    # 49 3-char words + one 2-char word -> mean < 3 fails
    low = "the ab " + " ".join(["abc"] * (MIN_WORDS - 2))
    assert not _gate_one(spark, low).r_mean_word_len


def test_alpha_words_boundary(spark):
    # exactly 80% alpha passes: 40 alpha + 10 numeric of 50
    words = ["the", "and"] + ["word"] * 38 + ["1234"] * 10
    assert _gate_one(spark, " ".join(words)).r_alpha_words
    # 39 alpha + 11 numeric -> 78% fails
    words = ["the", "and"] + ["word"] * 37 + ["1234"] * 11
    assert not _gate_one(spark, " ".join(words)).r_alpha_words


def test_stopword_rule(spark):
    # only one distinct stopword (repeated!) fails the >=2 rule
    one = "the " + " ".join(["the"] * 10 + ["word"] * (MIN_WORDS - 11))
    assert not _gate_one(spark, one).r_stopwords


def test_symbol_ratio_and_unicode_ellipsis(spark):
    # 5 symbols over 55 words (~9%) passes the 10% cap
    assert _gate_one(spark, BASE + " " + "# # # # #").r_symbol_ratio
    # 50 words, 5 '#' chars = exactly 10% passes; 6 fails
    ok = "the and " + " ".join(["word"] * 43) + " # # # # #"
    r = _gate_one(spark, ok)
    assert r.r_symbol_ratio  # 5 symbols / 50 words == 10%
    bad = "the and " + " ".join(["word"] * 42) + " # # # # # #"
    assert not _gate_one(spark, bad).r_symbol_ratio  # 6/50 > 10%


def test_line_rules(spark):
    # 2 of 4 lines end with ellipsis (50% > 30%) -> fail; bullets at
    # 75% <= 90% -> pass
    text = "\n".join(
        ["- " + BASE, "- " + BASE + "...", "- " + BASE + "…", BASE]
    )
    r = _gate_one(spark, text)
    assert not r.r_ellipsis_lines
    assert r.r_bullet_lines
    # 4 of 4 bullet lines (100% > 90%) -> fail
    text = "\n".join(["- " + BASE] * 4)
    assert not _gate_one(spark, text).r_bullet_lines


def test_empty_document_fails_without_dividing(spark):
    r = _gate_one(spark, "")
    assert not r.passes and not r.r_word_count


def test_release_builder_rule_stage(spark, tmp_path):
    """build_release(apply_rules=True): rule rejects are audited with
    the first failed rule's name, survivors flow on to the classifier
    stages, and accounting still closes (inputs == shards + drops)."""
    import glob

    import pandas as pd

    from football_data_pipeline_spark.operators.release import build_release

    long_doc = BASE + " " + " ".join(f"extra{i}" for i in range(20))
    rows = [
        (1, "en", "a", long_doc),
        (2, "en", "a", "too short to pass"),
        (3, "fr", "b", long_doc + " differs"),
    ]
    out = str(tmp_path / "rel")
    build_release(
        spark.createDataFrame(
            rows, "doc_id long, lang string, source string, text string"
        ),
        out,
        apply_rules=True,
    )
    drops = pd.concat(
        [pd.read_json(f, lines=True) for f in glob.glob(f"{out}/drops/*.json")]
    ) if glob.glob(f"{out}/drops/*.json") else pd.DataFrame(columns=["doc_id", "reason"])
    dropped = dict(zip(drops["doc_id"], drops["reason"]))
    assert dropped[2] == "rule:word_count"
    shard_files = glob.glob(f"{out}/shards/shard=*/*.parquet")
    shards = pd.concat([pd.read_parquet(f) for f in shard_files]) if shard_files else pd.DataFrame(columns=["doc_id"])
    assert len(shards) + len(drops) == len(rows)
    assert 2 not in set(shards.get("doc_id", []))


def test_oracle_parity_includes_empty_documents(spark, tmp_path):
    """The driver-grade oracle comparison on a crafted corpus WITH an
    empty and a whitespace-only document (regression: DuckDB
    list_sum([]) is NULL, so the un-coalesced oracle counted a
    mean_word_len failure Spark does not)."""
    import duckdb

    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import assert_matches_oracle

    rows = [
        (1, "en", "a", BASE),
        (2, "en", "a", ""),            # zero words
        (3, "en", "a", "   "),         # whitespace-only -> zero words
        (4, "fr", "b", "tiny doc"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", __import__("pyspark").sql.functions.length("text").cast("long")).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_gopher_rules"]
    assert_matches_oracle(q.fn(spark, d), con, q.oracle, "q_gopher_rules-empty")
