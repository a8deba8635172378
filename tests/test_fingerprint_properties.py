"""Property-based contracts for the perceptual fingerprint kernels
(hypothesis): the invariances the near-dup design RELIES on, stated
as laws rather than examples.

- audio envelope bits (audiodedup.envelope_fingerprint64) are GAIN
  invariant for any EXACTLY-representable scaling (powers of two —
  float multiplication by 2^k is exact, so every strict window-mean
  comparison is preserved bit-for-bit). For arbitrary gains the law
  holds only up to float rounding: hypothesis found window means
  differing by ~1 ULP whose ordering flips under mean(|x·g|) vs
  g·mean(|x|) — which is the honest contract (the module docstring
  says "gain changes that preserve ordering", and a 1-2 bit flip is
  exactly what the Hamming-3 verify budget absorbs);
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
    st.integers(min_value=-6, max_value=6),
)
def test_envelope_bits_gain_invariant(samples, gain_exp):
    # power-of-two gains: exact float scaling, so the strict
    # window-mean ordering (hence every bit) is preserved exactly —
    # see module docstring for why arbitrary gains are only
    # ULP-approximately invariant
    mono = np.asarray(samples, dtype=np.float64)
    base = envelope_fingerprint64(mono)
    scaled = envelope_fingerprint64(mono * 2.0**gain_exp)
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
