"""Short-clip (< 0.5 s) path and strategy routing.

Reference behaviours (reference: tests/test_short_clip.py): short clips use
the whole-window similarity + single 0-100% Pearson window; marker_tone
clips register a tone frequency while plain tones do not.
"""

import io

import numpy as np
import pytest

from audio_pattern_detector_tpu.models.detector import (
    MARKER_TONE_STRATEGY,
    AudioPatternDetector,
)
from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

SR = 8000


def _stream(audio):
    return AudioStream(
        name="synth", audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )


def make_short_clip(seconds=0.3, name="short"):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # A chirp-like distinctive envelope, not a pure tone.
    audio = (
        0.6 * np.sin(2 * np.pi * (600 + 800 * t / seconds) * t)
        * np.hanning(n).astype(np.float32)
    ).astype(np.float32)
    return AudioClip(name=name, audio=audio, sample_rate=SR)


class TestShortClipDetection:
    def test_short_clip_found(self):
        clip = make_short_clip()
        rng = np.random.default_rng(1)
        audio = (0.005 * rng.standard_normal(20 * SR)).astype(np.float32)
        o = int(7.25 * SR)
        audio[o : o + len(clip.audio)] += clip.audio
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        peaks, _ = det.find_clip_in_audio(_stream(audio))
        assert len(peaks["short"]) == 1
        assert abs(peaks["short"][0] - 7.25) < 0.01

    def test_noise_not_detected(self):
        clip = make_short_clip()
        rng = np.random.default_rng(2)
        audio = (0.3 * rng.standard_normal(20 * SR)).astype(np.float32)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        peaks, _ = det.find_clip_in_audio(_stream(audio))
        assert peaks["short"] == []


class TestStrategyRouting:
    def test_marker_tone_registers_frequency(self):
        n = int(0.25 * SR)
        t = np.arange(n) / SR
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        clip = AudioClip(
            name="beep",
            audio=tone,
            sample_rate=SR,
            strategy=MARKER_TONE_STRATEGY,
            strategy_params={"dominant_frequency_hz": 1000.0},
        )
        det = AudioPatternDetector(audio_clips=[clip])
        assert det._tone_frequencies["beep"] == 1000.0

    def test_marker_tone_derives_frequency_when_missing(self):
        n = int(0.25 * SR)
        t = np.arange(n) / SR
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        clip = AudioClip(
            name="beep", audio=tone, sample_rate=SR, strategy=MARKER_TONE_STRATEGY
        )
        det = AudioPatternDetector(audio_clips=[clip])
        assert det._tone_frequencies["beep"] == pytest.approx(1000.0, abs=20)

    def test_plain_clip_has_no_tone_frequency(self):
        n = int(0.25 * SR)
        t = np.arange(n) / SR
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        clip = AudioClip(name="plain", audio=tone, sample_rate=SR)
        det = AudioPatternDetector(audio_clips=[clip])
        assert "plain" not in det._tone_frequencies
