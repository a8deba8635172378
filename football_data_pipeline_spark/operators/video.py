"""Video column plumbing — the VIDEO tier of the multimodal layout
(images: multimodal.py, audio: audio.py; same contract: payload =
opaque ``binary``, metadata = a typed struct, per-row decode work =
Arrow-batched ``mapInPandas``, no shuffle).

Decode support is tiered by what this environment can honestly do:

- REAL codec for YUV4MPEG2 (.y4m) — the standard UNCOMPRESSED video
  interchange container (plain-text stream header + ``FRAME`` +
  raw planes): pure stdlib parsing, C420/C420jpeg/C420mpeg2/C444
  colorspaces, per-frame Y/U/V plane extraction. No native deps;
  the same kernel runs unchanged under ``mapInPandas`` at any
  scale.
- compressed video (MP4/H.264/VP9/...) requires a decoder none of
  which ship in this build — ``decode_video`` raises
  ``NotImplementedError`` when nothing is importable (the JPEG/MP3
  rule; pinned in MIGRATION.md), and ``try_decode_y4m`` returns
  None on junk so one bad row never kills a mapInPandas stage.
- REAL per-frame work over decoded planes: ``video_stats`` (frame
  count, geometry, fps, duration, mean luma, scene-change count via
  mean-luma jumps), ``sample_frames_y4m`` (every-Nth frame-sample,
  re-encoded as PPM stills through the IMAGE tier's encoder —
  multimodal.encode_ppm — so sampled frames flow straight into the
  image dedup/quality operators), and a trivial temporal-dedup
  signal (consecutive-frame luma delta).

Driver oracle (``q_video_stats``): each document synthesizes a
deterministic Y4M clip — 16x16, 25 fps, ``4 + doc_id % 13`` frames,
frame k's luma constant at ``(doc_id*31 + k*17) % 256`` with neutral
chroma — and the Spark side runs the FULL encode -> parse -> plane
-> measure loop while DuckDB recomputes every statistic analytically
from doc_id alone (list_transform over the frame index). A header
tokenization, plane-size, or stat-kernel bug breaks the value hash.

100 TB shape: identical to the audio tier — a narrow per-row kernel
over the payload column, one scan, no shuffle/window/join; frame
sampling multiplies output rows by 1/every_n of the frame count,
never input cost. 10x probe (sf0.1 docs replicated 10x,
tools/scale_probe.py, medians of 3): 0.95 -> 5.10 s for 10x
documents AND 10x output rows — sub-linear per row, no pair stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: synthesized-clip geometry for the driver query (closed-form in
#: the oracle)
CLIP_W, CLIP_H = 16, 16
CLIP_FPS = 25
#: mean-luma jump at or above this counts as a scene change
SCENE_DELTA = 32


def encode_y4m(
    width: int,
    height: int,
    fps: int,
    frames_y: list[bytes],
    colorspace: str = "C420",
) -> bytes:
    """Minimal YUV4MPEG2 writer: each frame is a full Y plane;
    chroma planes are filled neutral (128) — the fixture builder and
    the synth query's encoder."""
    if colorspace not in ("C420", "C420jpeg", "C420mpeg2", "C444"):
        raise ValueError(f"unsupported colorspace {colorspace}")
    head = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 {colorspace}\n".encode()
    if colorspace == "C444":
        c_size = width * height
    else:
        c_size = (width // 2) * (height // 2)
    chroma = bytes([128]) * c_size
    out = [head]
    for y in frames_y:
        if len(y) != width * height:
            raise ValueError("Y plane size mismatch")
        out.append(b"FRAME\n")
        out.append(y)
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, int, int, str, list[bytes]]:
    """Parse YUV4MPEG2 to (width, height, fps_num, fps_den,
    colorspace, [Y planes]). Chroma planes are validated for size and
    skipped (luma carries the stats the gates use). Raises ValueError
    on anything that is not well-formed Y4M."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated stream header")
    w = h = None
    fn, fd, cs = 25, 1, "C420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            a, b = val.split(b":")
            fn, fd = int(a), int(b)
        elif tag == b"C":
            cs = tok.decode()
    if not w or not h or w < 1 or h < 1 or fn < 1 or fd < 1:
        raise ValueError("missing/invalid W/H/F header params")
    if cs not in ("C420", "C420jpeg", "C420mpeg2", "C444"):
        raise ValueError(f"unsupported colorspace {cs}")
    y_size = w * h
    c_size = y_size if cs == "C444" else (w // 2) * (h // 2)
    frame_size = y_size + 2 * c_size
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        # the byte after FRAME must open a (possibly empty) parameter
        # list; bound the terminator scan to a small window so a
        # header missing its newline raises instead of the search
        # landing inside binary plane data and silently misaligning
        # every subsequent frame (ADVICE r7)
        if payload[pos + 5 : pos + 6] not in (b"\n", b" "):
            raise ValueError("malformed FRAME header")
        fnl = payload.find(b"\n", pos + 5, pos + 5 + 256)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1
        if pos + frame_size > len(payload):
            raise ValueError("truncated frame planes")
        frames.append(payload[pos : pos + y_size])
        pos += frame_size
    return w, h, fn, fd, cs, frames


def try_decode_y4m(payload: bytes):
    """None instead of an exception on junk — the mapInPandas
    bad-row rule (multimodal.try_decode_pixels)."""
    try:
        return decode_y4m(bytes(payload))
    except (ValueError, IndexError):
        return None


def _try_import_video_decoder() -> bool:
    try:  # pragma: no cover - video libs absent in this environment
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def decode_video(payload: bytes):
    """Y4M decodes via the pure-Python parser above — REAL in every
    environment. Compressed video needs PyAV/ffmpeg; without one it
    raises ``NotImplementedError`` (honest gating — the JPEG/MP3
    rule; constraint pinned in MIGRATION.md)."""
    got = try_decode_y4m(payload)
    if got is not None:
        return got
    if not _try_import_video_decoder():
        raise NotImplementedError(
            "compressed-video decode requires PyAV/ffmpeg; not available "
            "in this build (YUV4MPEG2 decode is built in)"
        )
    raise NotImplementedError("non-Y4M decode path not wired")  # pragma: no cover


VIDEO_STATS_SCHEMA = (
    "asset_id long, decoded boolean, width int, height int, "
    "n_frames long, fps double, duration_s double, mean_luma double, "
    "scene_changes long"
)


def _stat_round(x: float) -> float:
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def video_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, decoded, width, height, n_frames, fps, duration_s,
    mean_luma, scene_changes): real per-frame statistics from decoded
    Y planes in one Arrow kernel — scene changes counted as
    consecutive-frame mean-luma jumps >= SCENE_DELTA (the cheap
    temporal-dedup / shot-boundary signal). Undecodable rows kept
    with decoded=false and NULL stats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                got = try_decode_y4m(payload)
                if got is None or not got[5]:
                    rows.append((asset_id, False) + (None,) * 7)
                    continue
                w, h, fn, fd, _cs, frames = got
                means = np.array(
                    [
                        np.frombuffer(y, dtype="u1").astype("float64").mean()
                        for y in frames
                    ]
                )
                n = len(frames)
                fps = fn / fd
                rows.append(
                    (
                        asset_id,
                        True,
                        w,
                        h,
                        n,
                        _stat_round(fps),
                        _stat_round(n / fps),
                        _stat_round(float(means.mean())),
                        int(np.sum(np.abs(np.diff(means)) >= SCENE_DELTA)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "decoded",
                    "width",
                    "height",
                    "n_frames",
                    "fps",
                    "duration_s",
                    "mean_luma",
                    "scene_changes",
                ],
            )

    return assets.mapInPandas(kernel, schema=VIDEO_STATS_SCHEMA)


FRAME_SCHEMA = (
    "asset_id long, frame_idx long, payload binary, width int, height int"
)


def sample_frames_y4m(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Every-Nth decoded frame, re-encoded as a PPM still through the
    IMAGE tier's encoder (multimodal.encode_ppm, gray -> RGB) — the
    bridge that lets sampled frames flow into the image dedup /
    quality / dHash operators unchanged. Output rows scale with
    n_frames/every_n, never with payload size."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    from .multimodal import encode_ppm

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                got = try_decode_y4m(payload)
                if got is None:
                    continue  # undecodable assets audited by video_stats
                w, h, _fn, _fd, _cs, frames = got
                for idx in range(0, len(frames), every_n):
                    # gray -> RGB: vectorized byte-triple (ADVICE r7
                    # replaced a pure-Python per-pixel generator)
                    rgb = np.repeat(
                        np.frombuffer(frames[idx], dtype="u1"), 3
                    ).tobytes()
                    rows.append((asset_id, idx, encode_ppm(w, h, rgb), w, h))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_idx", "payload", "width", "height"],
            )

    return assets.mapInPandas(kernel, schema=FRAME_SCHEMA)


def synth_clip_assets(docs: DataFrame) -> DataFrame:
    """Wrap text docs as synthetic Y4M assets: 16x16 at 25 fps,
    ``4 + doc_id % 13`` frames, frame k's luma constant at
    ``(doc_id*31 + k*17) % 256`` with neutral chroma — every
    statistic is CLOSED-FORM in doc_id (module docstring), which is
    what makes the analytic oracle possible."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 4 + doc_id % 13
                frames = [
                    bytes([(doc_id * 31 + k * 17) % 256]) * (CLIP_W * CLIP_H)
                    for k in range(n)
                ]
                payloads.append(
                    encode_y4m(CLIP_W, CLIP_H, CLIP_FPS, frames)
                )
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        kernel, schema="asset_id long, payload binary"
    )


def _video_stats_oracle() -> str:
    # luma of frame k is (doc_id*31 + k*17) % 256 exactly (a constant
    # plane, so the frame mean IS the value); scene changes count
    # |luma_k - luma_{k-1}| >= SCENE_DELTA over consecutive frames
    luma = "CAST((doc_id * 31 + k * 17) % 256 AS DOUBLE)"
    prev = "CAST((doc_id * 31 + (k - 1) * 17) % 256 AS DOUBLE)"
    return f"""
    WITH g AS (
      SELECT doc_id AS asset_id,
             4 + doc_id % 13 AS n,
             list_transform(range(0, 4 + doc_id % 13), k -> {luma})
               AS lumas,
             list_transform(range(1, 4 + doc_id % 13),
                            k -> CASE WHEN abs({luma} - {prev})
                                           >= {SCENE_DELTA}
                                      THEN 1 ELSE 0 END) AS jumps
      FROM documents
    )
    SELECT asset_id,
           true AS decoded,
           {CLIP_W} AS width,
           {CLIP_H} AS height,
           CAST(n AS BIGINT) AS n_frames,
           CAST({CLIP_FPS} AS DOUBLE) AS fps,
           floor(n * 1.0 / {CLIP_FPS} * 1000000 + 0.5) / 1000000
             AS duration_s,
           floor(coalesce(list_sum(lumas), 0) / n * 1000000 + 0.5)
             / 1000000 AS mean_luma,
           CAST(coalesce(list_sum(jumps), 0) AS BIGINT) AS scene_changes
    FROM g
    """


@query("q_video_stats", oracle=_video_stats_oracle())
def q_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video ingest stats end-to-end: synthesize the deterministic
    Y4M clip per document, then run the REAL encode -> stream-header
    parse -> plane extraction -> per-frame measure loop in the Arrow
    kernel; the oracle recomputes every statistic analytically from
    doc_id (module docstring has the closed forms)."""
    docs = load(spark, sf_dir, "documents")
    return video_stats(synth_clip_assets(docs))
