"""Pure-tone analysis (host reference implementation).

Semantics parity with the reference tone analyser
(reference: audio_pattern_detector/detection_utils.py). The device fast
path re-implements the same math as batched tensor programs in
``ops/verify.py``; this host version anchors differential tests and serves
the exactness fallback path and init-time tone derivation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np
from numpy.typing import NDArray

from audio_pattern_detector_tpu.ops import hostref


@dataclass(frozen=True)
class PureToneMetrics:
    """Frequency-domain metrics for validating a pure-tone candidate window."""

    detected_frequency: float
    overall_band_purity: float
    active_frame_ratio: float
    longest_active_run: int
    active_frame_mean_purity: float


def get_pure_tone_frequency(
    audio_data: NDArray[np.float32], sample_rate: int
) -> float | None:
    """Dominant frequency if the audio is a pure tone, else None.

    Pure iff the normalised rfft magnitude has exactly one peak at
    prominence 0.05 and that peak matches the argmax bin within 1%.
    """
    fft_result = np.fft.rfft(audio_data)
    freqs = np.fft.rfftfreq(len(audio_data), d=1 / sample_rate)
    magnitude = np.abs(fft_result)
    dominant_idx = int(np.argmax(magnitude))
    dominant_magnitude = magnitude[dominant_idx]
    if dominant_magnitude == 0.0:
        return None
    magnitude_normalized = magnitude / dominant_magnitude
    peaks, _ = hostref.find_peaks(
        magnitude_normalized.astype(np.float32), prominence=0.05
    )
    dominant_freq = float(freqs[dominant_idx])
    if len(peaks) == 1 and math.isclose(
        float(freqs[peaks[0]]), dominant_freq, rel_tol=0.01
    ):
        return dominant_freq
    return None


def frame_grid(clip_length: int, sample_rate: int) -> tuple[int, int, int]:
    """(window_len, hop, frame_count) of the 25 ms / 50%-hop frame loop.

    The range ``range(0, clip_length - window_len, hop)`` excludes a final
    partial frame and excludes a frame starting exactly at
    ``clip_length - window_len`` (half-open upper bound) — boundary semantics
    the device path must reproduce (reference: detection_utils.py:87).
    """
    window_len = max(int(round(0.025 * sample_rate)), 32)
    hop = max(window_len // 2, 1)
    frame_count = len(range(0, clip_length - window_len, hop))
    return window_len, hop, frame_count


def analyze_pure_tone_candidate(
    audio_data: NDArray[np.float32],
    sample_rate: int,
    dominant_frequency: float,
) -> PureToneMetrics:
    """How strongly a candidate window behaves like a single pure tone.

    Whole-window Hann rfft band purity within ±max(40 Hz, 8%·f), then 25 ms
    frames at 50% hop with per-frame dominant-frequency lock
    (±max(20 Hz, 4%·f)) and frame purity ≥ 0.55 driving active-frame stats.
    """
    if len(audio_data) == 0:
        return PureToneMetrics(0.0, 0.0, 0.0, 0, 0.0)

    target_band_hz = max(40.0, dominant_frequency * 0.08)
    target_lock_hz = max(20.0, dominant_frequency * 0.04)

    windowed = audio_data * np.hanning(len(audio_data))
    spectrum = np.abs(np.fft.rfft(windowed))
    freqs = np.fft.rfftfreq(len(audio_data), d=1 / sample_rate)
    detected_frequency = float(freqs[int(np.argmax(spectrum))])

    total_energy = float(np.sum(spectrum**2))
    if total_energy == 0.0:
        return PureToneMetrics(detected_frequency, 0.0, 0.0, 0, 0.0)

    band = np.abs(freqs - dominant_frequency) <= target_band_hz
    overall_band_purity = float(np.sum(spectrum[band] ** 2)) / total_energy

    window_len, hop, _ = frame_grid(len(audio_data), sample_rate)
    frame_window = np.hanning(window_len)
    chunk_freqs = np.fft.rfftfreq(window_len, d=1 / sample_rate)
    frame_band = np.abs(chunk_freqs - dominant_frequency) <= target_band_hz

    frame_count = 0
    active_frame_count = 0
    longest_active_run = 0
    current_run = 0
    active_purities: list[float] = []

    for start in range(0, len(audio_data) - window_len, hop):
        chunk = audio_data[start : start + window_len] * frame_window
        spec = np.abs(np.fft.rfft(chunk))
        energy = float(np.sum(spec**2))
        if energy == 0.0:
            current_run = 0
            continue
        frame_count += 1
        frame_freq = float(chunk_freqs[int(np.argmax(spec))])
        frame_purity = float(np.sum(spec[frame_band] ** 2)) / energy
        is_active = (
            math.isclose(frame_freq, dominant_frequency, abs_tol=target_lock_hz)
            and frame_purity >= 0.55
        )
        if is_active:
            active_frame_count += 1
            current_run += 1
            longest_active_run = max(longest_active_run, current_run)
            active_purities.append(frame_purity)
        else:
            current_run = 0

    active_frame_ratio = active_frame_count / frame_count if frame_count > 0 else 0.0
    active_frame_mean_purity = float(np.mean(active_purities)) if active_purities else 0.0

    return PureToneMetrics(
        detected_frequency=detected_frequency,
        overall_band_purity=overall_band_purity,
        active_frame_ratio=active_frame_ratio,
        longest_active_run=longest_active_run,
        active_frame_mean_purity=active_frame_mean_purity,
    )


def extract_padded_segment(
    audio_data: NDArray[np.float32], start: int, length: int
) -> NDArray[np.float32]:
    """Fixed-length segment with zero padding at out-of-bounds edges."""
    stop = start + length
    left_pad = max(0, -start)
    right_pad = max(0, stop - len(audio_data))
    segment = audio_data[max(0, start) : min(len(audio_data), stop)]
    if left_pad > 0 or right_pad > 0:
        segment = np.pad(segment, (left_pad, right_pad))
    return np.asarray(segment, dtype=np.float32)


def max_distance(sorted_data: list[float]) -> float:
    """Maximum gap between consecutive elements of sorted data."""
    max_dist: float = 0
    for i in range(1, len(sorted_data)):
        max_dist = max(max_dist, sorted_data[i] - sorted_data[i - 1])
    return max_dist
