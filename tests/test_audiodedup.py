"""Audio envelope-fingerprint near-dup (the triad's last dedup
member): planted-fingerprint round-trip through the REAL WAV
decode → downmix → envelope kernel, group geometry the oracle
leans on, fallback semantics, and robustness properties. Oracle
parity for q_audio_near_dup rides the all-queries gate.
"""

from __future__ import annotations

import struct

import numpy as np

from football_data_pipeline_spark.operators.audio import encode_wav
from football_data_pipeline_spark.operators.audiodedup import (
    ENV_GROUPS,
    ENV_WINDOWS,
    SYNTH_WIN,
    _tone_hash_rows,
    audio_fingerprint,
    audio_near_dup,
    envelope_fingerprint64,
    synth_patterned_tones,
)


def _h64(rows):
    v = 0
    for b in rows:
        v = (v << 8) | b
    return v


def test_planted_fingerprint_survives_real_pipeline(spark):
    """synth → encode_wav → decode → envelope must reproduce the
    planted 64 bits exactly for every doc."""
    docs = spark.createDataFrame(
        [(d, "x") for d in (0, 1, 5, 24, 119, 4999)],
        "doc_id long, text string",
    )
    assets = synth_patterned_tones(docs)
    got = {r.asset_id: r for r in audio_fingerprint(assets).collect()}
    for d, r in got.items():
        assert r.decoded
        want = _h64(_tone_hash_rows(d))
        h = sum(
            (r[f"band{i}"] & 0xFFFF) << (16 * i) for i in range(4)
        )
        assert h == want, d


def test_group_geometry_matches_oracle_assumptions():
    """Within-group base↔perturbed distance exactly 2; cross-group
    always > 3 (so no cross-group near pair can ever appear)."""
    base, pert = {}, {}
    for d in range(480):
        m = d % ENV_GROUPS
        tgt = pert if d % 5 == 0 else base
        h = _h64(_tone_hash_rows(d))
        assert tgt.setdefault(m, h) == h
    assert set(base) == set(pert) == set(range(ENV_GROUPS))
    for m in base:
        assert bin(base[m] ^ pert[m]).count("1") == 2
    reps = list(base.items()) + list(pert.items())
    for i, (mi, hi) in enumerate(reps):
        for mj, hj in reps[i + 1 :]:
            if mi != mj:
                assert bin(hi ^ hj).count("1") > 3


def test_envelope_invariances_and_edges():
    """The fingerprint is an envelope-SHAPE code: invariant to
    order-preserving gain, sensitive to envelope reshaping; too-short
    signals return None (md5 fallback upstream)."""
    rng = np.random.default_rng(11)
    mono = rng.normal(0, 1000, ENV_WINDOWS * 40)
    h = envelope_fingerprint64(mono)
    assert envelope_fingerprint64(mono * 2.0) == h  # gain-invariant
    reshaped = mono * np.linspace(1, 8, len(mono))  # rising envelope
    assert envelope_fingerprint64(reshaped) != h
    assert envelope_fingerprint64(mono[: ENV_WINDOWS - 1]) is None


def test_near_dup_stereo_and_junk_rows(spark):
    """End-to-end over hand-built WAVs: a mono tone, its stereo twin
    (same per-channel signal → same downmixed envelope → star pair),
    and a junk payload that must survive as an md5-fallback row
    without killing the batch or pairing with anything."""
    bits = [1, 0] * 32
    amp, samples = 1000, []
    for j in range(ENV_WINDOWS):
        if j:
            amp += 100 * bits[j - 1]
        samples += [amp] * SYNTH_WIN
    mono = struct.pack(f"<{len(samples)}h", *samples)
    stereo = struct.pack(
        f"<{2 * len(samples)}h", *(v for s in samples for v in (s, s))
    )
    assets = spark.createDataFrame(
        [
            (1, encode_wav(8000, 1, mono)),
            (2, encode_wav(8000, 2, stereo)),
            (3, b"not audio at all"),
        ],
        "asset_id long, payload binary",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in audio_near_dup(assets).collect()}
    assert pairs == {(1, 2): 0}
