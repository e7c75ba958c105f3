"""Golden-file integration tests over the sample_audios corpus.

Mirrors the reference acceptance gate
(reference: tests/test_integration_matching.py): exact expected timestamps,
cross-pattern false-positive checks, 16 kHz resampling equivalence, and
streaming API consistency.
"""

import os

import numpy as np
import pytest

from tests.conftest import SAMPLE_AUDIOS
from audio_pattern_detector_tpu.match import match_pattern
from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream
from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

# Golden expectations (reference: tests/test_integration_matching.py:16-26).
CBS_EXPECTED = [25.89875]
RTHK_EXPECTED = [1.407375, 2.419125]
AM1430_EXPECTED = [13.848]

RTHK_AUDIO = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")
CBS_AUDIO = os.path.join(SAMPLE_AUDIOS, "cbs_news_audio_section.wav")
AM1430_AUDIO = os.path.join(SAMPLE_AUDIOS, "am1430_section_with_rainbow_intro.wav")
RTHK_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")
CBS_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "cbs_news.wav")
AM1430_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "天空下的彩虹intro.wav")
RTHK_AUDIO_16K = os.path.join(SAMPLE_AUDIOS, "test_16khz", "rthk_section_with_beep_16k.wav")
CBS_AUDIO_16K = os.path.join(SAMPLE_AUDIOS, "test_16khz", "cbs_news_audio_section_16k.wav")


def _assert_timestamps(got, expected, tol):
    assert len(got) == len(expected), f"want {expected}, got {got}"
    for g, e in zip(sorted(got), sorted(expected)):
        assert abs(g - e) < tol, f"want ~{e}, got {g}"


class TestGoldenTimestamps:
    def test_rthk_marker_tone(self):
        peaks, total = match_pattern(RTHK_AUDIO, [RTHK_PATTERN])
        _assert_timestamps(peaks["rthk_beep"], RTHK_EXPECTED, 0.01)
        assert 4.0 < total < 4.2

    def test_cbs_normal_path(self):
        peaks, _ = match_pattern(CBS_AUDIO, [CBS_PATTERN])
        _assert_timestamps(peaks["cbs_news"], CBS_EXPECTED, 0.01)

    def test_am1430_degraded(self):
        peaks, _ = match_pattern(AM1430_AUDIO, [AM1430_PATTERN])
        _assert_timestamps(peaks["天空下的彩虹intro"], AM1430_EXPECTED, 1.0)


class TestCrossPatternFalsePositives:
    """Every pattern against every non-matching audio yields nothing
    (reference: test_integration_matching.py:302-384)."""

    @pytest.mark.parametrize(
        "pattern,audio",
        [
            (RTHK_PATTERN, CBS_AUDIO),
            (RTHK_PATTERN, AM1430_AUDIO),
            (CBS_PATTERN, RTHK_AUDIO),
            (CBS_PATTERN, AM1430_AUDIO),
            (AM1430_PATTERN, RTHK_AUDIO),
            (AM1430_PATTERN, CBS_AUDIO),
        ],
    )
    def test_no_false_positive(self, pattern, audio):
        peaks, _ = match_pattern(audio, [pattern])
        for name, times in peaks.items():
            assert times == [], f"{name} false positive in {audio}: {times}"


class TestResampling16k:
    """16 kHz inputs resampled to 8 kHz produce the same detections
    (reference: test_integration_matching.py:500-678)."""

    def test_rthk_16k(self):
        peaks, _ = match_pattern(RTHK_AUDIO_16K, [RTHK_PATTERN])
        _assert_timestamps(peaks["rthk_beep"], RTHK_EXPECTED, 0.05)

    def test_cbs_16k(self):
        peaks, _ = match_pattern(CBS_AUDIO_16K, [CBS_PATTERN])
        _assert_timestamps(peaks["cbs_news"], CBS_EXPECTED, 0.05)

    def test_rthk_at_16k_target_rate(self):
        peaks, _ = match_pattern(
            RTHK_AUDIO_16K, [RTHK_PATTERN], target_sample_rate=16000
        )
        _assert_timestamps(peaks["rthk_beep"], RTHK_EXPECTED, 0.05)


class TestMultiPattern:
    def test_multiple_patterns_single_run(self):
        peaks, _ = match_pattern(RTHK_AUDIO, [RTHK_PATTERN, CBS_PATTERN])
        _assert_timestamps(peaks["rthk_beep"], RTHK_EXPECTED, 0.01)
        assert peaks["cbs_news"] == []

    def test_duplicate_pattern_names_rejected(self):
        with pytest.raises(ValueError, match="Duplicate clip name"):
            match_pattern(RTHK_AUDIO, [RTHK_PATTERN, RTHK_PATTERN])

    def test_missing_pattern_rejected(self):
        with pytest.raises(ValueError, match="does not exist"):
            match_pattern(RTHK_AUDIO, ["/nonexistent/pattern.wav"])

    def test_missing_audio_rejected(self):
        with pytest.raises(ValueError, match="does not exist"):
            match_pattern("/nonexistent/audio.wav", [RTHK_PATTERN])


class TestStreamingConsistency:
    """Streaming callbacks agree with accumulated results
    (reference: test_integration_matching.py:1009-1034)."""

    def test_callback_matches_accumulated(self):
        events = []
        peaks, _ = match_pattern(
            RTHK_AUDIO,
            [RTHK_PATTERN],
            on_pattern_detected=lambda name, ts: events.append((name, ts)),
            accumulate_results=True,
        )
        accumulated = [(n, t) for n, ts in peaks.items() for t in ts]
        assert sorted(events) == sorted(accumulated)

    def test_accumulate_false_returns_none(self):
        peaks, total = match_pattern(
            RTHK_AUDIO, [RTHK_PATTERN], accumulate_results=False
        )
        assert peaks is None
        assert total > 0


class TestInterleavedPatterns:
    def test_interleaved_generated(self):
        audio = os.path.join(SAMPLE_AUDIOS, "test_generated", "interleaved_patterns.wav")
        clips_dir = os.path.join(SAMPLE_AUDIOS, "test_generated", "clips")
        patterns = sorted(
            os.path.join(clips_dir, f)
            for f in os.listdir(clips_dir)
            if f.endswith(".wav") or f.endswith(".apd.toml")
        )
        if not patterns:
            pytest.skip("no generated clips present")
        peaks, total = match_pattern(audio, patterns)
        assert total > 0
        # All detections must be within stream bounds and sorted per clip.
        for name, times in peaks.items():
            assert times == sorted(times)
            for t in times:
                assert 0 <= t <= total
