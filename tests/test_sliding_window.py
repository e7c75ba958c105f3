"""Synthetic-stream engine tests: chunking, lookback, timestamp algebra.

The dominant reference test pattern (reference: tests/test_sliding_window.py):
synthesise numpy audio, wrap raw float32 bytes in BytesIO, and check
timestamps across chunk indices, boundary straddling, overlap duplicates,
and chunk-size validation.
"""

import io

import numpy as np
import pytest

from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

SR = 8000


def make_clip(seconds=1.0, seed=7, name="clip"):
    """Aperiodic noise-burst test pattern (delta-like autocorrelation, so
    partial/offset alignments can never verify — keeps chunk-boundary tests
    unambiguous)."""
    n = int(seconds * SR)
    rng = np.random.default_rng(seed)
    audio = (0.4 * rng.standard_normal(n)).astype(np.float32)
    return AudioClip(name=name, audio=audio, sample_rate=SR)


def make_stream(audio: np.ndarray, name="synth") -> AudioStream:
    return AudioStream(
        name=name,
        audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )


def embed(clip: AudioClip, offsets, total_seconds, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    audio = (noise * rng.standard_normal(int(total_seconds * SR))).astype(np.float32)
    for off in offsets:
        o = int(off * SR)
        audio[o : o + len(clip.audio)] += clip.audio
    return audio


def detect(clip, audio, seconds_per_chunk=60, **kwargs):
    det = AudioPatternDetector(
        audio_clips=[clip], seconds_per_chunk=seconds_per_chunk, **kwargs
    )
    peaks, total = det.find_clip_in_audio(make_stream(audio))
    return peaks[clip.name], total


class TestTimestampAccuracy:
    def test_first_chunk(self):
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [10.0], 70))
        assert len(times) == 1
        assert abs(times[0] - 10.0) < 0.01

    def test_second_chunk(self):
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [75.0], 130))
        assert len(times) == 1
        assert abs(times[0] - 75.0) < 0.01

    def test_many_chunks_no_drift(self):
        clip = make_clip()
        offsets = [10.0 + 60 * k for k in range(10)]
        times, _ = detect(clip, embed(clip, offsets, 60 * 10 + 20))
        assert len(times) == len(offsets)
        for t, o in zip(sorted(times), offsets):
            assert abs(t - o) < 0.01, f"drift at {o}: {t}"

    def test_boundary_straddling(self):
        # Pattern spans the 60 s chunk boundary; the lookback window must
        # contain it fully in the second chunk's section.
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [59.5], 130))
        assert any(abs(t - 59.5) < 0.01 for t in times), times

    def test_match_at_zero(self):
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [0.0], 70))
        assert len(times) == 1
        assert abs(times[0] - 0.0) < 0.01

    def test_match_near_stream_end_short_final_chunk(self):
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [63.0], 65.5))
        assert len(times) == 1
        assert abs(times[0] - 63.0) < 0.01

    def test_overlap_duplicates_identical(self):
        # A pattern inside the lookback region is seen by both chunks; the
        # duplicate timestamps must be identical (reference:
        # tests/test_sliding_window.py:1174-1228).
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [59.2], 130))
        close = [t for t in times if abs(t - 59.2) < 0.01]
        assert len(close) in (1, 2)
        if len(close) == 2:
            assert close[0] == close[1]


class TestChunkValidation:
    def test_too_small_chunk_rejected(self):
        clip = make_clip(seconds=3.0)
        with pytest.raises(ValueError, match="too small"):
            AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)

    def test_auto_chunk_computation(self):
        clip = make_clip(seconds=3.0)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=None)
        assert det.seconds_per_chunk == 6  # ceil(3)*2

    def test_auto_chunk_detection_works(self):
        clip = make_clip(seconds=2.0)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=None)
        audio = embed(clip, [5.0], 12)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert len(peaks[clip.name]) == 1
        assert abs(peaks[clip.name][0] - 5.0) < 0.01

    def test_unique_names_required(self):
        clip = make_clip()
        with pytest.raises(ValueError, match="unique"):
            AudioPatternDetector(audio_clips=[clip, make_clip(name="clip")])

    def test_sample_rate_mismatch_rejected(self):
        clip = make_clip()
        wrong = AudioClip(name="wrong", audio=clip.audio, sample_rate=16000)
        with pytest.raises(ValueError, match="sample rate"):
            AudioPatternDetector(audio_clips=[wrong])

    def test_stream_rate_mismatch_rejected(self):
        clip = make_clip()
        det = AudioPatternDetector(audio_clips=[clip])
        stream = AudioStream(
            name="x", audio_stream=io.BytesIO(b"\0" * 400), sample_rate=44100
        )
        with pytest.raises(ValueError, match="sample rate"):
            det.find_clip_in_audio(stream)


class TestTotalTime:
    def test_total_time_exact(self):
        clip = make_clip()
        audio = embed(clip, [], 65.4321)
        _, total = detect(clip, audio)
        assert total == pytest.approx(len(audio) / SR, abs=1e-9)

    def test_empty_stream(self):
        clip = make_clip()
        det = AudioPatternDetector(audio_clips=[clip])
        peaks, total = det.find_clip_in_audio(make_stream(np.zeros(0)))
        assert total == 0.0
        assert peaks == {"clip": []}


class TestBoundaryEdgeCases:
    def test_pattern_exactly_at_chunk_boundary_start(self):
        # Clip starting exactly at the boundary belongs wholly to chunk 1.
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [60.0], 130))
        close = [t for t in times if abs(t - 60.0) < 0.01]
        assert len(close) >= 1

    def test_pattern_ending_exactly_at_boundary(self):
        # Clip occupying [59, 60) is wholly in chunk 0 and also fully inside
        # chunk 1's lookback window: expect the match (possibly duplicated
        # with identical timestamps).
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [59.0], 130))
        close = [t for t in times if abs(t - 59.0) < 0.01]
        assert len(close) in (1, 2)
        assert len(set(close)) == 1

    def test_chunk_equal_to_minimum_size(self):
        clip = make_clip(seconds=5.0)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        audio = embed(clip, [12.0], 30)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert len(peaks["clip"]) >= 1
        assert any(abs(t - 12.0) < 0.01 for t in peaks["clip"])

    def test_stream_shorter_than_one_chunk(self):
        clip = make_clip()
        times, total = detect(clip, embed(clip, [2.0], 5.5))
        assert total == 5.5
        assert len(times) == 1
        assert abs(times[0] - 2.0) < 0.01

    def test_two_patterns_same_chunk_ordering(self):
        clip = make_clip()
        times, _ = detect(clip, embed(clip, [5.0, 20.0, 35.0], 60))
        assert times == sorted(times)
        assert len(times) == 3

    def test_straddle_into_final_short_chunk(self):
        # Regression pinned by the reference (tests/test_sliding_window.py:
        # 363-404): the uniform sliding-window prepend applies to the final
        # short chunk too. The final chunk here is 2.9 s of a 3 s chunk size
        # — under the old "last chunk_size seconds of prev+chunk" rule the
        # effective lookback would shrink to 0.1 s and the straddling
        # pattern would be lost on both sides.
        clip = make_clip(seconds=0.8)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=3)
        audio = embed(clip, [2.9], 5.9)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert any(abs(t - 2.9) < 0.01 for t in peaks["clip"]), peaks["clip"]


class TestLargeSlidingWindowNoDrift:
    """Long clips (multi-second sliding windows) across many chunks: the
    timestamp algebra must not accumulate drift (reference:
    tests/test_sliding_window.py:642-952)."""

    def test_large_window_tenth_chunk(self):
        clip = make_clip(seconds=2.5)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        audio = embed(clip, [95.0], 110)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert len(peaks["clip"]) >= 1
        closest = min(peaks["clip"], key=lambda t: abs(t - 95.0))
        assert abs(closest - 95.0) < 0.01, f"drift after 10 chunks: {closest}"

    def test_first_vs_tenth_chunk_equal_error(self):
        clip = make_clip(seconds=2.5)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        audio = embed(clip, [5.0, 95.0], 110)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        early = min(peaks["clip"], key=lambda t: abs(t - 5.0))
        late = min(peaks["clip"], key=lambda t: abs(t - 95.0))
        early_err, late_err = abs(early - 5.0), abs(late - 95.0)
        assert abs(late_err - early_err) < 0.005, (
            f"cumulative drift: early {early_err:.6f}s vs late {late_err:.6f}s"
        )

    def test_large_window_boundary_straddle(self):
        clip = make_clip(seconds=2.5)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        audio = embed(clip, [8.5], 30)  # spans the 10 s boundary
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert any(abs(t - 8.5) < 0.01 for t in peaks["clip"]), peaks["clip"]

    def test_very_large_window_far_into_stream(self):
        clip = make_clip(seconds=4.5)  # sliding window 5 s
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=15)
        audio = embed(clip, [50.0], 70)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        assert len(peaks["clip"]) >= 1
        closest = min(peaks["clip"], key=lambda t: abs(t - 50.0))
        assert abs(closest - 50.0) < 0.01


class TestOverlapDuplicateIdentity:
    """A pattern inside the lookback region may be reported by both chunks;
    when it is, the two timestamps must be bit-identical so the JSONL layer
    can dedup on equal rounded ms (reference: tests/test_sliding_window.py:
    955-1228)."""

    @pytest.mark.parametrize("offset", [56.5, 57.0, 58.0, 59.0])
    def test_duplicates_identical_at_offsets(self, offset):
        clip = make_clip(seconds=3.5)  # sliding window 4 s; chunk 60 s
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=60)
        audio = embed(clip, [offset], 130)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        close = [t for t in peaks["clip"] if abs(t - offset) < 0.01]
        assert len(close) >= 1, peaks["clip"]
        assert len(set(close)) == 1, f"duplicates differ: {close}"

    def test_duplicate_count_at_most_two(self):
        clip = make_clip(seconds=3.5)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=60)
        audio = embed(clip, [58.0], 130)
        peaks, _ = det.find_clip_in_audio(make_stream(audio))
        close = [t for t in peaks["clip"] if abs(t - 58.0) < 0.01]
        assert 1 <= len(close) <= 2, peaks["clip"]


class TestChunkSizeRules:
    """The ceil(sliding-window) and 2x-minimum rules, pinned across a table
    of durations (reference: tests/test_sliding_window.py:1231-1494)."""

    @pytest.mark.parametrize(
        "duration,window",
        [(0.1, 1), (0.5, 1), (1.0, 1), (1.1, 2), (2.0, 2), (2.5, 3), (4.9, 5)],
    )
    def test_minimum_is_twice_ceil_duration(self, duration, window):
        clip = make_clip(seconds=duration)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=2 * window)
        assert det.seconds_per_chunk == 2 * window
        if 2 * window - 1 >= 1:  # below 1 the value auto-computes instead
            with pytest.raises(ValueError, match="too small"):
                AudioPatternDetector(
                    audio_clips=[make_clip(seconds=duration)],
                    seconds_per_chunk=2 * window - 1,
                )

    @pytest.mark.parametrize("value", [0, -5])
    def test_nonpositive_chunk_auto_computes(self, value):
        clip = make_clip(seconds=2.5)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=value)
        assert det.seconds_per_chunk == 6  # ceil(2.5) * 2

    def test_longest_clip_governs_validation(self):
        clips = [make_clip(0.5, name="short"), make_clip(3.0, seed=9, name="long")]
        with pytest.raises(ValueError, match="too small"):
            AudioPatternDetector(audio_clips=clips, seconds_per_chunk=4)
        det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=8)
        assert det.seconds_per_chunk == 8

    def test_auto_compute_uses_longest(self):
        clips = [
            make_clip(1.0, name="a"),
            make_clip(2.5, seed=9, name="b"),
            make_clip(0.3, seed=11, name="c"),
        ]
        det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=None)
        assert det.seconds_per_chunk == 6
