"""Two-tier candidate detection: both tiers match the exact host path.

The production (lean) device program picks a 16-lane or full-k_detect lane
width at runtime from the raw candidate count (models/bank.py
_lean_group_packed). These tests engineer chunks that land on each side of
the tier boundary — and straddle it between consecutive chunks of one
stream — and assert the device results equal the exact host model.
"""

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector
from audio_pattern_detector_tpu.models import hostpath

SR = 8000


def _host_expected(bank, g, section):
    return hostpath.process_section_host(
        audio_section=section,
        clip=g.clips_np[0],
        correlation_clip=g.corr_clips_np[0],
        correlation_clip_absolute_max=float(g.self_max_np[0]),
        sr=SR,
        height_min=bank.height_min,
        is_short_clip=g.clip_len / SR < 0.5,
        tone_frequency=g.tone_freqs[0],
        verification_params=g.verification_params[0],
    )


def _count_candidates(bank, g, section):
    """Raw above-height candidate count, host model (find_peaks sans
    distance), to verify which tier a chunk exercises."""
    from audio_pattern_detector_tpu.ops import hostref

    norm = hostpath.normalize_section(section, SR)
    corr = np.abs(hostref.fft_correlate_1d(norm, g.clips_np[0], mode="full"))
    denom = max(float(g.self_max_np[0]), float(corr.max()))
    corr = corr / max(denom, 1e-38)
    peaks, _ = hostref.find_peaks(corr, height=bank.height_min)
    return len(peaks)


@pytest.fixture(scope="module")
def noise_clip_detector():
    rng = np.random.default_rng(3)
    clip = AudioClip(
        name="c",
        audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
    return det, det._ensure_bank()


def _chunk_with_copies(clip_audio, n_copies, seconds, seed):
    rng = np.random.default_rng(seed)
    audio = (0.004 * rng.standard_normal(seconds * SR)).astype(np.float32)
    for k in range(n_copies):
        o = int((0.3 + 1.05 * k) * SR)
        audio[o : o + SR] += clip_audio[: min(SR, len(audio) - o)]
    return audio


def test_small_tier_matches_host(noise_clip_detector):
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    audio = _chunk_with_copies(g.clips_np[0], 3, 20, seed=11)
    n = _count_candidates(bank, g, audio)
    assert 1 <= n <= 16, f"expected a small-tier chunk, got {n} candidates"
    assert bank.process_chunk(audio, None)["c"] == _host_expected(bank, g, audio)


def test_full_tier_matches_host(noise_clip_detector):
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    audio = _chunk_with_copies(g.clips_np[0], 18, 20, seed=12)
    n = _count_candidates(bank, g, audio)
    assert 16 < n <= g.k_detect, (
        f"expected a full-tier (non-overflow) chunk, got {n} candidates"
    )
    assert bank.process_chunk(audio, None)["c"] == _host_expected(bank, g, audio)


def test_tier_straddling_stream_matches_serial_host(noise_clip_detector):
    """Consecutive chunks flip tiers; each must stay exact (with lookback)."""
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    sparse = _chunk_with_copies(g.clips_np[0], 2, 20, seed=13)
    dense = _chunk_with_copies(g.clips_np[0], 18, 20, seed=14)

    prev = None
    for chunk in (sparse, dense, sparse):
        if prev is not None:
            section = np.concatenate([prev[-g.sliding_window * SR :], chunk])
        else:
            section = chunk
        got = bank.process_chunk(chunk, prev)["c"]
        assert got == _host_expected(bank, g, section)
        prev = chunk


def test_marker_hit_exercises_tiers_exactly():
    """A real marker-tone hit produces a dense comb of raw candidates
    (full tier or host fallback); the device result must match the host."""
    t = np.arange(int(0.25 * SR)) / SR
    tone = (0.8 * np.sin(2 * np.pi * 1040.0 * t)).astype(np.float32)
    clip = AudioClip(
        name="m",
        audio=tone,
        sample_rate=SR,
        strategy="marker_tone",
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
    bank = det._ensure_bank()
    g = bank.classes[1]["groups"][0]

    rng = np.random.default_rng(5)
    audio = (0.002 * rng.standard_normal(20 * SR)).astype(np.float32)
    o = int(7.25 * SR)
    audio[o : o + len(tone)] += tone

    n = _count_candidates(bank, g, audio)
    assert n > 16, f"marker comb should exceed the small tier, got {n}"
    assert bank.process_chunk(audio, None)["m"] == _host_expected(bank, g, audio)
