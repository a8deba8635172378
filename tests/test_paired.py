"""Paired image-text curation (operators/paired.py): dual-side
verdict attribution, the missing-asset rule, and the streaming
writer's closure + replay idempotence. Oracle parity for the
composed funnels rides the all-queries gate (q_pair_curation).
"""

from __future__ import annotations

from football_data_pipeline_spark.operators.multimodal import encode_ppm
from football_data_pipeline_spark.operators.paired import (
    curate_pairs,
    pair_curation_batch_writer,
)

DOCS = "doc_id long, text string, lang string, source string"
ASSETS = "asset_id long, kind string, payload binary"
PAIRS = "doc_id long, asset_id long"


def _checker():
    rgb = bytearray()
    for y in range(16):
        for x in range(16):
            v = 255 if (x + y) % 2 == 0 else 0
            rgb += bytes((v, v, v))
    return encode_ppm(16, 16, bytes(rgb))


def _flat():
    return encode_ppm(16, 16, bytes([9, 9, 9]) * 256)


GOOD = "alpha beta delta mango grape lime peach"
BAD = "gamma epsilon theta kiwi cherry contact"  # negative-weight mean


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD, "en", "a"),               # text keeps
            (2, BAD, "en", "a"),                # low_quality
            (3, GOOD, "en", "a"),               # exact dup of 1 wait — same set
            (4, "omega sigma plum lemon write totally novel", "en", "b"),
        ],
        DOCS,
    )
    assets = spark.createDataFrame(
        [
            (10, "image", _checker()),          # gate keeps
            (20, "image", _flat()),             # flat
            (30, "image", _checker()),          # gate keeps
        ],
        ASSETS,
    )
    pairs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 10), (4, 99)], PAIRS
    )
    return docs, assets, pairs


def test_dual_attribution_and_missing_asset(spark):
    docs, assets, pairs = _fixture(spark)
    out = {
        (r.doc_id, r.asset_id): r
        for r in curate_pairs(docs, assets, pairs).collect()
    }
    assert set(out) == {(1, 10), (2, 30), (3, 10), (4, 99)}
    # pair (1,10): both sides survive
    assert out[(1, 10)].keep
    assert out[(1, 10)].text_reason is None and out[(1, 10)].media_reason is None
    # pair (2,30): text kills it, media fine — attribution says which
    assert not out[(2, 30)].keep
    assert out[(2, 30)].text_reason == "low_quality"
    assert out[(2, 30)].media_reason is None
    # pair (3,10): doc 3 is the exact dup of doc 1 (same word set)
    assert out[(3, 10)].text_reason == "exact_duplicate"
    # pair (4,99): dangling asset id — audited, never silently kept
    assert not out[(4, 99)].keep
    assert out[(4, 99)].media_reason == "missing_asset"
    assert out[(4, 99)].text_reason is None


def test_missing_doc_audited_never_silently_kept(spark):
    # a pair whose DOC side has no row must be missing_doc — under a
    # bare left join it would be indistinguishable from surviving
    # text (the NULL-kind lesson, doc side)
    docs = spark.createDataFrame([(1, GOOD, "en", "a")], DOCS)
    assets = spark.createDataFrame([(10, "image", _checker())], ASSETS)
    pairs = spark.createDataFrame([(1, 10), (77, 10), (78, 99)], PAIRS)
    out = {
        (r.doc_id, r.asset_id): r
        for r in curate_pairs(docs, assets, pairs).collect()
    }
    assert out[(1, 10)].keep
    assert not out[(77, 10)].keep
    assert out[(77, 10)].text_reason == "missing_doc"
    assert out[(77, 10)].media_reason is None
    # both sides dangling → both audited on the one row
    assert out[(78, 99)].text_reason == "missing_doc"
    assert out[(78, 99)].media_reason == "missing_asset"


def test_writer_missing_doc_from_null_columns(spark, tmp_path):
    # in the pair STREAM an absent doc side arrives as NULL
    # text/lang/source on the pair row — the writer must route it to
    # missing_doc, not gate a NULL document
    root = str(tmp_path / "md")
    w = pair_curation_batch_writer(root)
    batch = spark.createDataFrame(
        [
            (1, GOOD, "en", "a", 10, "image", _checker()),
            (9, None, None, None, 10, "image", _checker()),
        ],
        "doc_id long, text string, lang string, source string, "
        "asset_id long, kind string, payload binary",
    )
    w(batch, 0)
    drops = {
        (r.doc_id, r.asset_id): r
        for r in spark.read.option("basePath", f"{root}/pair_drops")
        .parquet(f"{root}/pair_drops")
        .collect()
    }
    kept = {
        (r.doc_id, r.asset_id)
        for r in spark.read.option("basePath", f"{root}/pairs")
        .parquet(f"{root}/pairs")
        .collect()
    }
    assert kept == {(1, 10)}
    assert drops[(9, 10)].text_reason == "missing_doc"
    assert drops[(9, 10)].media_reason is None


def test_both_sides_can_fail_one_pair(spark):
    docs = spark.createDataFrame([(2, BAD, "en", "a")], DOCS)
    assets = spark.createDataFrame([(20, "image", _flat())], ASSETS)
    pairs = spark.createDataFrame([(2, 20)], PAIRS)
    [r] = curate_pairs(docs, assets, pairs).collect()
    assert not r.keep
    assert r.text_reason == "low_quality" and r.media_reason == "flat"


def test_writer_closure_and_replay(spark, tmp_path):
    root = str(tmp_path / "p")
    w = pair_curation_batch_writer(root)
    docs, assets, pairs = _fixture(spark)
    batch = (
        pairs.join(docs, "doc_id")
        .join(assets, "asset_id", "left")
        .select(
            "doc_id", "text", "lang", "source", "asset_id", "kind", "payload"
        )
    )
    w(batch, 0)

    def read(sub):
        return spark.read.option("basePath", f"{root}/{sub}").parquet(
            f"{root}/{sub}"
        )

    drops = {
        (r.doc_id, r.asset_id): r for r in read("pair_drops").collect()
    }
    kept = {(r.doc_id, r.asset_id) for r in read("pairs").collect()}
    assert kept == {(1, 10)}
    assert set(drops) == {(2, 30), (3, 10), (4, 99)}
    assert drops[(4, 99)].media_reason == "missing_asset"
    # closure: every pair in exactly one side
    assert (set(drops) | kept) == {(1, 10), (2, 30), (3, 10), (4, 99)}
    assert set(drops) & kept == set()
    # crash-replay reproduces identical state
    w(batch, 0)
    assert {(r.doc_id, r.asset_id) for r in read("pairs").collect()} == kept
    assert {
        (r.doc_id, r.asset_id) for r in read("pair_drops").collect()
    } == set(drops)
