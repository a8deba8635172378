"""Property-based contracts for the perceptual fingerprint kernels
(hypothesis): the invariances the near-dup design RELIES on, stated
as laws rather than examples.

- audio envelope bits (audiodedup.envelope_fingerprint64) are GAIN
  invariant: scaling a signal by any positive factor preserves the
  strict ordering of window means, hence every difference bit — the
  property that makes the fingerprint robust to re-encoding volume
  changes (module docstring's Haitsma-Kalker argument);
- image dHash (multimodal.dhash64) is BRIGHTNESS-SHIFT invariant
  while unclipped: adding a constant to every gray level preserves
  the strict < comparisons of the downsampled gradient — the
  property that makes logo/spacer variants collide;
- both kernels are pure functions of their input (determinism),
  so fingerprints are stable across retries/executors.

These are pure-Python kernels (no SparkSession), so hypothesis can
afford hundreds of cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from football_data_pipeline_spark.operators.audiodedup import (
    ENV_WINDOWS,
    envelope_fingerprint64,
)
from football_data_pipeline_spark.operators.multimodal import dhash64


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-30000, max_value=30000),
        min_size=ENV_WINDOWS,
        max_size=ENV_WINDOWS * 8,
    ),
    st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
)
def test_envelope_bits_gain_invariant(samples, gain):
    mono = np.asarray(samples, dtype=np.float64)
    base = envelope_fingerprint64(mono)
    scaled = envelope_fingerprint64(mono * gain)
    assert base == scaled
    # determinism
    assert base == envelope_fingerprint64(mono)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-10, max_value=10), min_size=0, max_size=ENV_WINDOWS - 1))
def test_envelope_too_short_is_none(samples):
    assert envelope_fingerprint64(np.asarray(samples, dtype=np.float64)) is None


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=40),
)
def test_dhash_brightness_shift_invariant(seed, shift):
    rng = np.random.RandomState(seed % 2**31)
    # keep headroom so +shift never clips (gray in [0, 215])
    gray = rng.randint(0, 216 - 40, size=(16, 16)).astype(np.uint8)
    rgb = np.repeat(gray.reshape(-1), 3).tobytes()
    shifted = np.repeat((gray + shift).reshape(-1), 3).astype(np.uint8).tobytes()
    assert dhash64(16, 16, rgb) == dhash64(16, 16, shifted)
    assert dhash64(16, 16, rgb) == dhash64(16, 16, rgb)  # determinism


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_dhash_is_64_bits_and_band_split_roundtrips(seed):
    rng = np.random.RandomState(seed % 2**31)
    gray = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    h = dhash64(16, 16, np.repeat(gray.reshape(-1), 3).tobytes())
    assert 0 <= h < 2**64
    bands = [(h >> (16 * i)) & 0xFFFF for i in range(4)]
    assert sum(b << (16 * i) for i, b in enumerate(bands)) == h
