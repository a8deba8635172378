"""Streaming media-asset gate (streaming/media.py): mixed-kind
micro-batches through the batch-layer tier gates, two-sided audit
closure per batch, replay idempotence, and the end-to-end
readStream wiring.
"""

from __future__ import annotations

import glob
import struct

from football_data_pipeline_spark.operators.audio import encode_wav
from football_data_pipeline_spark.operators.multimodal import encode_ppm
from football_data_pipeline_spark.operators.video import encode_y4m
from football_data_pipeline_spark.streaming.media import (
    gate_media_batch,
    media_gate_batch_writer,
    start_media_gate_pipeline,
)

SCHEMA = "asset_id long, kind string, payload binary"


def _noisy_ppm():
    rgb = bytearray()
    for y in range(16):
        for x in range(16):
            v = 255 if (x + y) % 2 == 0 else 0
            rgb += bytes((v, v, v))
    return encode_ppm(16, 16, bytes(rgb))


def _wav(samples16):
    return encode_wav(8000, 1, struct.pack(f"<{len(samples16)}h", *samples16))


def _clip(lumas):
    return encode_y4m(16, 16, 25, [bytes([l]) * 256 for l in lumas])


def _mixed_rows():
    return [
        (1, "image", _noisy_ppm()),                         # keep
        (2, "image", encode_ppm(16, 16, bytes([9, 9, 9]) * 256)),  # flat
        (3, "audio", _wav([0, 12000, -12000, 9000] * 200)),  # keep
        (4, "audio", _wav([32767, -32767] * 300)),           # clipped
        (5, "video", _clip([0, 100] * 4)),                   # keep
        (6, "video", _clip([50] * 10)),                      # static
        (7, "gif", b"GIF89a..."),                            # unknown kind
        (9, None, b"???"),  # NULL kind — must be audited, never dropped
    ]


def test_gate_media_batch_closure_and_reasons(spark):
    batch = spark.createDataFrame(_mixed_rows(), SCHEMA)
    got = {r.asset_id: r for r in gate_media_batch(batch).collect()}
    # closure: every input asset classified exactly once — including
    # the NULL-kind row, which the r9 verdict caught vanishing under
    # three-valued ~isin logic
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 9}
    reasons = {a: r.reason for a, r in got.items()}
    assert reasons == {
        1: None,
        2: "flat",
        3: None,
        4: "clipped",
        5: None,
        6: "static",
        7: "unknown_kind",
        9: "unknown_kind",
    }
    assert got[7].kind == "gif"  # misrouted rows keep their kind
    assert got[9].kind == "unknown"  # NULL kind surfaces as 'unknown'


def test_writer_layout_and_replay_idempotence(spark, tmp_path):
    root = str(tmp_path / "media")
    writer = media_gate_batch_writer(root)
    batch = spark.createDataFrame(_mixed_rows(), SCHEMA)
    writer(batch, 0)
    writer(
        spark.createDataFrame([(8, "audio", _wav([0, 1] * 300))], SCHEMA), 1
    )  # silent

    def read(sub):
        return spark.read.option("basePath", f"{root}/{sub}").parquet(
            f"{root}/{sub}"
        )

    drops = {r.asset_id: r.reason for r in read("media_drops").collect()}
    kept = {r.asset_id for r in read("media_assets").collect()}
    assert drops == {
        2: "flat", 4: "clipped", 6: "static", 7: "unknown_kind", 8: "silent",
        9: "unknown_kind",
    }
    assert kept == {1, 3, 5}
    # crash-replay of batch 0 reproduces the identical state
    writer(batch, 0)
    assert {r.asset_id: r.reason for r in read("media_drops").collect()} == drops
    assert {r.asset_id for r in read("media_assets").collect()} == kept


def test_stream_end_to_end_two_files(spark, tmp_path):
    """Real readStream wiring: two source files → two micro-batches
    (maxFilesPerTrigger=1), audit complete across both."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "media")
    ckpt = str(tmp_path / "ckpt")
    rows = _mixed_rows()
    spark.createDataFrame(rows[:4], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows[4:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start_media_gate_pipeline(spark, src, root, ckpt)
    q.awaitTermination(120)
    n_batches = len(glob.glob(f"{root}/media_*/batch_id=*"))
    assert n_batches >= 2  # both sides written, at least one batch each
    drops = spark.read.option("basePath", f"{root}/media_drops").parquet(
        f"{root}/media_drops"
    )
    kept = spark.read.option("basePath", f"{root}/media_assets").parquet(
        f"{root}/media_assets"
    )
    ids = {r.asset_id for r in drops.collect()} | {
        r.asset_id for r in kept.collect()
    }
    assert ids == {1, 2, 3, 4, 5, 6, 7, 9}
