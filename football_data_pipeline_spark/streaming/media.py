"""Streaming media-asset gate — the MULTIMODAL twin of the text
curation funnel (pipeline.curation_batch_writer): a micro-batch
stream of opaque media payloads is split by kind, run through the
batch layer's own tier gates (never re-implemented here), and
written as the same two-sided audit the release builder produces —
every asset of every batch lands in exactly one of drops/manifest,
with the gate verdict as the drop reason.

Per micro-batch N::

    {root}/media_drops/batch_id=N    (asset_id, kind, reason)
    {root}/media_assets/batch_id=N   (asset_id, kind)

Gate dispatch by the ``kind`` column: ``image`` →
multimodal.classify_image_quality (undecodable / too_small /
bad_aspect / flat), ``audio`` → audio.audio_quality_gate (undecoded
/ too_short / clipped / silent), ``video`` →
video.video_quality_gate (undecoded / too_short / static). A kind
the gate table doesn't know is AUDITED as ``unknown_kind`` — the
rejects-audited-never-silent contract extends to misrouted rows.

Exactly-once: each batch's two outputs are overwrite-mode writes
into ``batch_id=N`` partitions keyed by the framework-stable
batch_id — a crash-replay of batch N rewrites byte-equivalent
partitions (the silver_batch_writer argument; replay idempotence is
pytest-locked). No state is read back, so there is no crash window
between the two writes: each is independently idempotent.

100 TB shape: per batch this is ONE Arrow decode pass per present
tier (each gate is a map-only plan — multimodal.py/audio.py/
video.py document their kernels) plus two partition-local writes;
no join, no shuffle, no history read. The stream scales by
partitioning the payload column exactly like the batch gates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the normalized audit row every tier's gate output maps onto
_GATED_COLS = ("asset_id", "kind", "reason")


def gate_media_batch(batch: DataFrame) -> DataFrame:
    """(asset_id, kind, reason): the per-asset gate verdicts for one
    mixed-kind batch — reason NULL means keep. Pure composition of
    the three batch-layer gates; exposed separately from the writer
    so the classification logic is testable without a sink."""
    from ..operators.audio import audio_quality_gate, audio_stats
    from ..operators.multimodal import classify_image_quality
    from ..operators.video import video_quality_gate, video_stats

    payloads = batch.select("asset_id", "kind", "payload")
    parts = []
    img = payloads.filter(F.col("kind") == "image").drop("kind")
    parts.append(
        classify_image_quality(img).select(
            "asset_id", F.lit("image").alias("kind"), "reason"
        )
    )
    aud = payloads.filter(F.col("kind") == "audio").drop("kind")
    parts.append(
        audio_quality_gate(audio_stats(aud)).select(
            "asset_id",
            F.lit("audio").alias("kind"),
            F.when(F.col("verdict") != "ok", F.col("verdict")).alias("reason"),
        )
    )
    vid = payloads.filter(F.col("kind") == "video").drop("kind")
    parts.append(
        video_quality_gate(video_stats(vid)).select(
            "asset_id",
            F.lit("video").alias("kind"),
            F.when(F.col("verdict") != "ok", F.col("verdict")).alias("reason"),
        )
    )
    other = payloads.filter(~F.col("kind").isin("image", "audio", "video"))
    parts.append(
        other.select(
            "asset_id", "kind", F.lit("unknown_kind").alias("reason")
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def media_gate_batch_writer(root: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: gate one micro-batch and write the
    two-sided audit (module docstring has layout + exactly-once
    argument)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        gated = gate_media_batch(batch).localCheckpoint()
        gated.filter(F.col("reason").isNotNull()).select(*_GATED_COLS).write.mode(
            "overwrite"
        ).parquet(f"{root}/media_drops/batch_id={batch_id}")
        gated.filter(F.col("reason").isNull()).select(
            "asset_id", "kind"
        ).write.mode("overwrite").parquet(
            f"{root}/media_assets/batch_id={batch_id}"
        )

    return write_batch


def start_media_gate_pipeline(
    spark: SparkSession,
    source_path: str,
    root: str,
    checkpoint: str,
    trigger: str | None = None,
):
    """Wire the streaming media gate: a parquet file source of
    (asset_id, kind, payload) rows → per-micro-batch gate + audit
    writes. ``trigger=None`` → availableNow."""
    schema = "asset_id long, kind string, payload binary"
    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_path)
        .writeStream.foreachBatch(media_gate_batch_writer(root))
        .option("checkpointLocation", checkpoint)
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()
