"""Exact host-side chunk processing (numpy, f64 where the reference is).

Replicates the reference's per-clip chunk flow
(reference: audio_pattern_detector.py:389-903) on the host using the
hostref ops. Used as:

* the exactness fallback when a chunk produces more raw peak candidates
  than the device program's static candidate capacity (adversarial inputs;
  never real program material), and
* the golden model for differential tests of the device engine.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from numpy.typing import NDArray

from audio_pattern_detector_tpu.ops import hostref
from audio_pattern_detector_tpu.ops.tone import (
    analyze_pure_tone_candidate,
    extract_padded_segment,
)
from audio_pattern_detector_tpu.utils.audio_io import slicing_with_zero_padding

SIMILARITY_HARD_LIMIT = 0.02
PEARSON_R_THRESHOLD = 0.90

# Default marker-tone thresholds (reference: audio_pattern_detector.py:698-705).
MARKER_THRESHOLD_DEFAULTS = {
    "minimum_band_purity": 0.95,
    "minimum_active_frame_ratio": 0.80,
    "minimum_longest_active_run": 9,
    "minimum_active_frame_mean_purity": 0.92,
    "maximum_min_flank_purity": 0.25,
    "maximum_max_flank_purity": 0.65,
}


def normalize_section(audio_section: NDArray[np.float32], sr: int) -> NDArray[np.float32]:
    """Loudness-normalise a section to -16 LUFS and scrub NaN to zero
    (reference: audio_pattern_detector.py:414-420, 489-490)."""
    seconds = len(audio_section) / sr
    block = seconds if seconds < 0.5 else 0.4
    loudness = hostref.integrated_loudness(audio_section, sr, block_size=block)
    normalized = hostref.loudness_normalize(audio_section, loudness, -16.0)
    return np.nan_to_num(normalized, nan=0.0)


def _verify_normal_host(
    correlation_clip: NDArray[np.float32],
    correlation_slice: NDArray[np.float32],
    is_short_clip: bool,
) -> tuple[bool, float, float]:
    """10-partition MSE + centre-window Pearson
    (reference: audio_pattern_detector.py:752-903).

    Returns (accept, similarity, pearson_r).
    """
    partition_count = 10
    ps = len(correlation_clip) // partition_count
    mses = np.array(
        [
            np.mean(
                (
                    correlation_clip[i * ps : (i + 1) * ps]
                    - correlation_slice[i * ps : (i + 1) * ps]
                )
                ** 2
            )
            for i in range(partition_count)
        ],
        dtype=np.float32,
    )
    similarity_middle = float(np.mean(mses[4:6]))
    similarity_whole = float(np.mean(mses))
    similarity = similarity_whole if is_short_clip else min(similarity_whole, similarity_middle)

    if similarity > SIMILARITY_HARD_LIMIT:
        return False, similarity, -1.0

    ds_base = 101
    if is_short_clip:
        wl, wr, ds_n = 0, 10, round(ds_base * 10 / 2)
    else:
        wl, wr, ds_n = 4, 6, ds_base
    lc = len(correlation_clip)
    lo, hi = round(lc * wl / 10), round(lc * wr / 10)
    ds_clip = hostref.resample_preserve_maxima(correlation_clip[lo:hi], ds_n)
    ds_slice = hostref.resample_preserve_maxima(correlation_slice[lo:hi], ds_n)
    r = hostref.pearson_correlation(ds_clip, ds_slice)
    return r >= PEARSON_R_THRESHOLD, similarity, r


def _verify_marker_host(
    audio_section: NDArray[np.float32],
    peak: int,
    clip_length: int,
    dominant_frequency: float,
    sr: int,
    verification: dict[str, Any],
) -> bool:
    """Marker-tone verification (reference: audio_pattern_detector.py:642-750)."""
    import math

    match_start = peak - clip_length + 1
    matched = extract_padded_segment(audio_section, match_start, clip_length)
    left = extract_padded_segment(audio_section, match_start - clip_length, clip_length)
    right = extract_padded_segment(audio_section, match_start + clip_length, clip_length)
    metrics = analyze_pure_tone_candidate(matched, sr, dominant_frequency)
    left_m = analyze_pure_tone_candidate(left, sr, dominant_frequency)
    right_m = analyze_pure_tone_candidate(right, sr, dominant_frequency)

    if not isinstance(verification, dict):
        verification = {}
    d = MARKER_THRESHOLD_DEFAULTS
    min_band = float(verification.get("minimum_band_purity", d["minimum_band_purity"]))
    min_ratio = float(
        verification.get("minimum_active_frame_ratio", d["minimum_active_frame_ratio"])
    )
    min_run = int(
        verification.get("minimum_longest_active_run", d["minimum_longest_active_run"])
    )
    min_mean = float(
        verification.get(
            "minimum_active_frame_mean_purity", d["minimum_active_frame_mean_purity"]
        )
    )
    max_min_flank = float(
        verification.get("maximum_min_flank_purity", d["maximum_min_flank_purity"])
    )
    max_max_flank = float(
        verification.get("maximum_max_flank_purity", d["maximum_max_flank_purity"])
    )

    if not math.isclose(metrics.detected_frequency, dominant_frequency, rel_tol=0.05):
        return False

    min_flank = min(left_m.overall_band_purity, right_m.overall_band_purity)
    max_flank = max(left_m.overall_band_purity, right_m.overall_band_purity)
    return (
        metrics.overall_band_purity >= min_band
        and metrics.active_frame_ratio >= min_ratio
        and metrics.longest_active_run >= min_run
        and metrics.active_frame_mean_purity >= min_mean
        and min_flank <= max_min_flank
        and max_flank <= max_max_flank
    )


def process_section_host(
    audio_section: NDArray[np.float32],
    clip: NDArray[np.float32],
    correlation_clip: NDArray[np.float32],
    correlation_clip_absolute_max: float,
    sr: int,
    height_min: float,
    is_short_clip: bool,
    tone_frequency: float | None,
    verification_params: dict[str, Any],
) -> list[int]:
    """Full Step-1 + Step-2 for one clip over one (raw) audio section.

    Returns accepted peak positions ('full' correlation indices, ascending).
    """
    section = normalize_section(audio_section, sr)
    correlation = np.abs(hostref.fft_correlate_1d(section, clip, mode="full"))
    absolute_max = np.max(correlation)
    max_choose = max(correlation_clip_absolute_max, absolute_max)
    correlation = correlation / max_choose

    clip_length = len(clip)
    peaks, _ = hostref.find_peaks(correlation, height=height_min, distance=clip_length)

    peaks_final: list[int] = []
    half = len(correlation_clip) // 2
    for peak in peaks:
        peak = int(peak)
        if peak + half > len(correlation) + 5:
            continue
        if peak - half < -5:
            continue
        if tone_frequency is not None:
            accepted = _verify_marker_host(
                section, peak, clip_length, tone_frequency, sr, verification_params
            )
            if accepted:
                peaks_final.append(peak)
        else:
            correlation_slice = slicing_with_zero_padding(
                correlation, len(correlation_clip), peak
            )
            correlation_slice = correlation_slice / np.max(correlation_slice)
            if len(correlation_slice) != len(correlation_clip):
                raise ValueError(
                    f"correlation_slice length {len(correlation_slice)} not equal to "
                    f"correlation_clip length {len(correlation_clip)}"
                )
            accepted, _, _ = _verify_normal_host(
                correlation_clip, correlation_slice, is_short_clip
            )
            if accepted:
                peaks_final.append(peak)
    return peaks_final
