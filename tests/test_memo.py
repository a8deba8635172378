"""payload_memo — the byte-bounded per-worker kernel memo (r14,
VERDICT r13 item 6): entry-count-bounded lru_cache keyed on raw
payload bytes could pin maxsize × multi-MB payloads per worker at
production payload sizes; the gate keeps oversized payloads out of
the cache without changing any result (the kernels are pure)."""

from __future__ import annotations

from football_data_pipeline_spark.functions.memo import (
    PAYLOAD_MEMO_MAX_BYTES,
    payload_memo,
)


def test_small_payloads_are_cached():
    calls = []

    @payload_memo(maxsize=8)
    def fn(payload: bytes) -> int:
        calls.append(payload)
        return len(payload)

    p = b"x" * 100
    assert fn(p) == 100
    assert fn(p) == 100
    assert len(calls) == 1  # second call served from the memo
    assert fn.cache_info().currsize == 1
    assert fn.cache_info().hits == 1


def test_oversized_payloads_bypass_the_cache():
    calls = []

    @payload_memo(maxsize=8, max_bytes=1000)
    def fn(payload: bytes) -> int:
        calls.append(payload)
        return len(payload)

    big = b"x" * 1001
    assert fn(big) == 1001
    assert fn(big) == 1001
    assert len(calls) == 2  # computed every call
    assert fn.cache_info().currsize == 0  # and NEVER cached
    # the boundary itself still caches (gate is strictly-greater)
    edge = b"y" * 1000
    assert fn(edge) == 1000 and fn(edge) == 1000
    assert fn.cache_info().currsize == 1
    assert len(calls) == 3


def test_extra_args_participate_in_the_key():
    @payload_memo(maxsize=8)
    def fn(payload: bytes, n: int) -> int:
        return len(payload) * n

    p = b"z" * 10
    assert fn(p, 2) == 20 and fn(p, 3) == 30
    assert fn.cache_info().currsize == 2


def test_every_payload_keyed_kernel_is_gated():
    """All eight payload-keyed media kernels must carry the byte
    gate (wrapper exposes cache_info + __wrapped__, and an oversized
    payload leaves the cache untouched). The two tuple-keyed synth
    caches (_pattern_plane_cached, _tone_payload) are deliberately
    NOT gated — their keys are small int tuples."""
    from football_data_pipeline_spark.operators.audio import _audio_stats_row
    from football_data_pipeline_spark.operators.audiodedup import _afp_row
    from football_data_pipeline_spark.operators.multimodal import (
        _image_stats_row,
        _img_quality_row,
        _phash_row,
    )
    from football_data_pipeline_spark.operators.video import (
        _sampled_frames,
        _video_stats_row,
    )
    from football_data_pipeline_spark.streaming.mediadedup import _vfp_rows

    one_arg = [
        _audio_stats_row,
        _afp_row,
        _image_stats_row,
        _img_quality_row,
        _phash_row,
        _video_stats_row,
    ]
    big = b"\0" * (PAYLOAD_MEMO_MAX_BYTES + 1)
    for fn in one_arg:
        assert callable(fn.cache_info) and hasattr(fn, "__wrapped__"), fn
        before = fn.cache_info().currsize
        fn(big)  # undecodable junk: kernels return their failure row
        assert fn.cache_info().currsize == before, fn
    for fn in (_sampled_frames, _vfp_rows):
        assert callable(fn.cache_info) and hasattr(fn, "__wrapped__"), fn
        before = fn.cache_info().currsize
        fn(big, 4)
        assert fn.cache_info().currsize == before, fn
