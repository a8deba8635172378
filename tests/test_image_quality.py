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


def test_release_builder_three_media_tiers(spark, tmp_path):
    """VERDICT r8 item 4: build_release accepts all three media
    tiers beside the text corpus, each with the rejects-audited-
    never-silent closure — every input asset of every tier lands in
    exactly one of its tier's two outputs, with the gate's verdict
    as the drop reason."""
    from football_data_pipeline_spark.operators.audio import encode_wav
    from football_data_pipeline_spark.operators.release import build_release
    from football_data_pipeline_spark.operators.video import encode_y4m

    docs = spark.createDataFrame(
        [(i, "useful clean text with several plain words", "en", "web")
         for i in range(1, 4)],
        "doc_id long, text string, lang string, source string",
    )

    def wav(samples16):
        import struct

        return encode_wav(8000, 1, struct.pack(f"<{len(samples16)}h", *samples16))

    audio = spark.createDataFrame(
        [
            (1, wav([0, 12000, -12000, 9000] * 200)),            # ok
            (2, b"RIFFjunk"),                                    # undecoded
            (3, wav([0, 1000] * 100)),                           # 0.025 s: too_short
            (4, wav([32767, -32767] * 300)),                     # clipped
            (5, wav([0, 1] * 300)),                              # silent
        ],
        ASSET_SCHEMA,
    )

    def clip(lumas):
        return encode_y4m(16, 16, 25, [bytes([l]) * 256 for l in lumas])

    video = spark.createDataFrame(
        [
            (1, clip([0, 100, 0, 100, 0, 100, 0, 100])),  # ok
            (2, b"not video"),                            # undecoded
            (3, clip([10])),                              # 0.04 s: too_short
            (4, clip([50] * 10)),                         # static
        ],
        ASSET_SCHEMA,
    )

    path = str(tmp_path / "rel")
    build_release(
        docs, path, assets=_assets(spark), audio_assets=audio, video_assets=video
    )

    def load_json(sub):
        out = []
        for f in glob.glob(f"{path}/{sub}/*.json"):
            out += [json.loads(l) for l in open(f) if l.strip()]
        return out

    # image tier unchanged
    assert {d["asset_id"] for d in load_json("assets")} == {1}
    # audio tier: closure + per-verdict attribution
    a_drops = {d["asset_id"]: d["reason"] for d in load_json("audio_drops")}
    a_kept = load_json("audio_assets")
    assert a_drops == {2: "undecoded", 3: "too_short", 4: "clipped", 5: "silent"}
    assert [d["asset_id"] for d in a_kept] == [1]
    assert a_kept[0]["rate"] == 8000 and a_kept[0]["duration_s"] == 0.1
    assert set(a_drops) | {d["asset_id"] for d in a_kept} == {1, 2, 3, 4, 5}
    # video tier: closure + per-verdict attribution
    v_drops = {d["asset_id"]: d["reason"] for d in load_json("video_drops")}
    v_kept = load_json("video_assets")
    assert v_drops == {2: "undecoded", 3: "too_short", 4: "static"}
    assert [d["asset_id"] for d in v_kept] == [1]
    assert v_kept[0]["n_frames"] == 8 and v_kept[0]["scene_changes"] == 7
    assert set(v_drops) | {d["asset_id"] for d in v_kept} == {1, 2, 3, 4}


def test_release_builder_dedup_media(spark, tmp_path):
    """build_release(dedup_media=True): gate-passed assets in each
    tier run the perceptual near-dup resolution — identical copies
    drop as near_duplicate with dup_of = the min-id owner, gate
    rejects keep NULL dup_of, manifests exclude the dups, closure
    holds per tier."""
    import struct

    from football_data_pipeline_spark.operators.audio import encode_wav
    from football_data_pipeline_spark.operators.release import build_release
    from football_data_pipeline_spark.operators.video import encode_y4m

    docs = spark.createDataFrame(
        [(1, "useful clean text with several plain words", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )

    def wav(samples16):
        return encode_wav(8000, 1, struct.pack(f"<{len(samples16)}h", *samples16))

    def clip(lumas):
        return encode_y4m(16, 16, 25, [bytes([l]) * 256 for l in lumas])

    images = spark.createDataFrame(
        [
            (1, _noisy(16, 16)),   # keep (owner)
            (2, _noisy(16, 16)),   # identical -> near_duplicate of 1
            (3, _noisy(4, 4)),     # gate: too_small (never fingerprinted)
        ],
        ASSET_SCHEMA,
    )
    tone = wav([0, 12000, -12000, 9000] * 200)
    audio = spark.createDataFrame(
        [(1, tone), (2, tone), (3, wav([0, 1] * 300))], ASSET_SCHEMA
    )  # 3 = silent (gate)
    v = clip([0, 100, 0, 100, 0, 100, 0, 100])
    video = spark.createDataFrame(
        [(1, v), (2, v), (3, clip([50] * 10))], ASSET_SCHEMA
    )  # 3 = static (gate)

    path = str(tmp_path / "rel")
    build_release(
        docs, path, assets=images, audio_assets=audio, video_assets=video,
        dedup_media=True,
    )

    def load_json(sub):
        out = []
        for f in glob.glob(f"{path}/{sub}/*.json"):
            out += [json.loads(l) for l in open(f) if l.strip()]
        return out

    for drops_sub, kept_sub, gate_reason in (
        ("image_drops", "assets", "too_small"),
        ("audio_drops", "audio_assets", "silent"),
        ("video_drops", "video_assets", "static"),
    ):
        drops = {d["asset_id"]: d for d in load_json(drops_sub)}
        kept = {d["asset_id"] for d in load_json(kept_sub)}
        assert kept == {1}, drops_sub
        assert drops[2]["reason"] == "near_duplicate" and drops[2]["dup_of"] == 1
        assert drops[3]["reason"] == gate_reason
        assert drops[3].get("dup_of") is None
        assert set(drops) | kept == {1, 2, 3}  # closure
