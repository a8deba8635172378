"""Image-side quality gate (VERDICT r4 item 9): crafted good /
degenerate images through classify_image_quality, and the release
builder's image_drops / assets outputs.
"""

from __future__ import annotations

import glob
import json

from football_data_pipeline_spark.operators.multimodal import (
    IMG_MIN_STD,
    classify_image_quality,
    encode_ppm,
)

ASSET_SCHEMA = "asset_id long, payload binary"


def _noisy(w, h):
    # deterministic high-contrast checker texture
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if (x + y) % 2 == 0 else 0
            rgb += bytes((v, v, v))
    return encode_ppm(w, h, bytes(rgb))


def _assets(spark):
    rows = [
        (1, _noisy(16, 16)),  # good
        (2, encode_ppm(16, 16, bytes([100, 150, 200]) * 256)),  # flat solid
        (3, _noisy(4, 4)),  # too small
        (4, _noisy(64, 8)),  # 8:1 aspect
        (5, b"\x00\x01not an image"),  # undecodable
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_gate_reasons_and_scores(spark):
    got = {r.asset_id: r for r in classify_image_quality(_assets(spark)).collect()}
    assert got[1].keep and got[1].reason is None
    assert got[1].score == 1.0  # checker luma std ≈ 127 ≫ full-scale 64
    assert not got[2].keep and got[2].reason == "flat"
    assert got[2].std_luma < IMG_MIN_STD
    assert not got[3].keep and got[3].reason == "too_small"
    assert not got[4].keep and got[4].reason == "bad_aspect"
    assert not got[5].keep and got[5].reason == "undecodable"
    assert got[5].score == 0.0 and got[5].width is None
    # accounting closure: every asset classified exactly once
    assert len(got) == 5


def test_release_builder_image_side(spark, tmp_path):
    from football_data_pipeline_spark.operators.release import build_release

    docs = spark.createDataFrame(
        [(i, "useful clean text with several plain words", "en", "web")
         for i in range(1, 6)],
        "doc_id long, text string, lang string, source string",
    )
    path = str(tmp_path / "rel")
    build_release(docs, path, assets=_assets(spark))

    def load_json(sub):
        [f] = glob.glob(f"{path}/{sub}/*.json")
        return [json.loads(l) for l in open(f) if l.strip()]

    drops = {d["asset_id"]: d["reason"] for d in load_json("image_drops")}
    kept = {d["asset_id"] for d in load_json("assets")}
    assert drops == {2: "flat", 3: "too_small", 4: "bad_aspect", 5: "undecodable"}
    assert kept == {1}


def test_zero_pixel_image_rejected_without_nan(spark):
    """A decodable 0-pixel payload must classify too_small with NULL
    stats, never NaN."""
    import math

    zero = encode_ppm(0, 0, b"")
    [r] = classify_image_quality(
        spark.createDataFrame([(9, zero)], ASSET_SCHEMA)
    ).collect()
    assert not r.keep and r.reason == "too_small"
    assert r.mean_luma is None and r.std_luma is None
    assert r.score == 0.0  # uniform reject score, never NULL/NaN
