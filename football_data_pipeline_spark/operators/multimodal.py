"""Multimodal column plumbing (build-plan step 6).

Media assets are opaque ``binary`` columns plus a typed metadata
struct — the lakehouse pattern for image/audio/video at scale: bytes
travel in the column (or a pointer to object storage), metadata is
queryable, and decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the heavy Python work streams per-partition
without a shuffle.

The decode kernels themselves are STUBBED (PIL/ffmpeg are not in
this environment): ``decode_image`` raises ``NotImplementedError``
unless a decoder import succeeds, and ``extract_features`` computes
deterministic byte-level pseudo-features so the Spark-side plumbing —
schema, batching, UDF signature, partition behavior — is fully real
and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

FEATURE_SCHEMA = (
    "asset_id long, mime string, n_bytes long, checksum string, "
    "fake_width int, fake_height int, decoded boolean"
)


def to_media_assets(docs: DataFrame) -> DataFrame:
    """Wrap text docs as synthetic media assets: payload = utf-8
    bytes, metadata struct alongside — the column layout real
    image/audio tables use."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _try_import_decoder():
    try:  # pragma: no cover - decoder libs absent in this environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes):
    """Real decode path — requires an imaging library.

    STUB in this environment (no PIL/opencv); when a decoder is
    importable the payload is decoded for real, so the function is
    honest either way.
    """
    if not _try_import_decoder():
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this build"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Deterministic fake kernel (byte stats + md5 checksum + derived
    fake dimensions) standing in for decode→resize→embed; swap the
    body for a real decoder without touching the pipeline shape.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": n_bytes,
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "fake_width": (64 + n_bytes % 512).astype("int32"),
                    "fake_height": (64 + (n_bytes // 7) % 512).astype("int32"),
                    "decoded": False,  # stub kernel never decodes
                }
            )

    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           'image/fake' AS mime,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(64 + strlen(text) % 512 AS INTEGER) AS fake_width,
           CAST(64 + (strlen(text) // 7) % 512 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary payload — the queryable
    half of the multimodal layout (pure built-ins: octet_length +
    md5 over bytes), matching what extract_features computes in its
    Pandas kernel.
    """
    docs = load(spark, sf_dir, "documents")
    n = F.octet_length("text").cast("long")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("mime"),
        n.alias("n_bytes"),
        F.md5(F.encode("text", "utf-8")).alias("checksum"),
        (F.lit(64) + n % 512).cast("int").alias("fake_width"),
        (F.lit(64) + F.floor(n / 7) % 512).cast("int").alias("fake_height"),
    )


RESIZED_SCHEMA = "asset_id long, payload binary, mime string, width int, height int"


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Binary-in/binary-out Arrow-batched transform — the
    decode→resize→re-encode shape.

    STUB kernel: deterministic byte truncation/padding to width×height
    bytes stands in for a real resampler; the pipeline contract
    (schema, batch shape, per-partition streaming, no shuffle) is the
    production one. Swap the body for PIL when a decoder is present.
    """
    target = width * height

    def kernel(batches):
        for pdf in batches:
            payloads = pdf["payload"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SIZE = 256  # stub "frame" = fixed byte chunk


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video-shaped payloads: one output row per
    kept frame (frame index, frame bytes).

    Implemented with built-ins only — no Python in the hot path: the
    payload splits into fixed-size chunks via a sequence+transform
    over substrings of the binary, explodes to rows, and keeps every
    n-th frame. At scale this is a generator (explode) inside
    whole-stage codegen; the decode of each kept frame is then the
    mapInPandas stage (stubbed, as above).
    """
    # empty payloads are dropped up front: sequence(0, n_frames − 1)
    # with n_frames = 0 would be sequence(0, -1) = [0, -1] (Spark
    # sequences step downward), yielding one spurious empty frame row
    n_frames = F.ceil(F.octet_length("payload") / F.lit(FRAME_SIZE)).cast("int")
    frame_idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    framed = assets.filter(F.octet_length("payload") > 0).select(
        F.col("asset_id"), F.col("payload"), frame_idx
    )
    return (
        framed.filter(F.col("frame_idx") % every_n == 0)
        .select(
            "asset_id",
            "frame_idx",
            F.expr(f"substring(payload, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE})").alias(
                "frame_bytes"
            ),
        )
    )
