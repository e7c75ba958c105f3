"""Public engine API contract: callbacks, accumulate flag, get_config.

Mirrors reference tests (reference: tests/test_detector_api.py): callback
ordering/monotonicity/types, accumulate_results=False -> None, and the
get_config schema.
"""

import io

import numpy as np

from audio_pattern_detector_tpu.models.detector import (
    DEFAULT_SECONDS_PER_CHUNK,
    AudioPatternDetector,
)
from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

SR = 8000


def make_clip(seconds=1.0, name="clip"):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    audio = (
        0.5 * np.sin(2 * np.pi * 523 * t) * np.sin(2 * np.pi * 3.0 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
    ).astype(np.float32)
    return AudioClip(name=name, audio=audio, sample_rate=SR)


def make_audio(clip, offsets, total_seconds, seed=0):
    rng = np.random.default_rng(seed)
    audio = (0.01 * rng.standard_normal(int(total_seconds * SR))).astype(np.float32)
    for off in offsets:
        o = int(off * SR)
        audio[o : o + len(clip.audio)] += clip.audio
    return audio


def stream_of(audio):
    return AudioStream(
        name="synth", audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )


class TestCallbacks:
    def test_callback_arg_types(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        det.find_clip_in_audio(
            stream_of(make_audio(clip, [5.0], 70)),
            on_pattern_detected=lambda n, t: events.append((n, t)),
        )
        assert len(events) == 1
        name, ts = events[0]
        assert isinstance(name, str)
        assert isinstance(ts, float)

    def test_callbacks_monotonic_across_chunks(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        det.find_clip_in_audio(
            stream_of(make_audio(clip, [5.0, 30.0, 65.0, 100.0], 130)),
            on_pattern_detected=lambda n, t: events.append(t),
        )
        assert events == sorted(events)
        assert len(events) == 4

    def test_multi_clip_callbacks_sorted_within_chunk(self):
        a = make_clip(name="a")
        n = int(SR * 1.0)
        t = np.arange(n) / SR
        b_audio = (
            0.5 * np.sin(2 * np.pi * 700 * t) * np.sin(2 * np.pi * 5.0 * t)
        ).astype(np.float32)
        b = AudioClip(name="b", audio=b_audio, sample_rate=SR)
        audio = make_audio(a, [20.0], 70)
        audio[int(10.0 * SR) : int(10.0 * SR) + n] += b_audio
        events = []
        det = AudioPatternDetector(audio_clips=[a, b])
        det.find_clip_in_audio(
            stream_of(audio), on_pattern_detected=lambda nm, ts: events.append((ts, nm))
        )
        assert [e[1] for e in sorted(events)] == [e[1] for e in events]

    def test_no_callback_is_fine(self):
        clip = make_clip()
        det = AudioPatternDetector(audio_clips=[clip])
        peaks, _ = det.find_clip_in_audio(stream_of(make_audio(clip, [5.0], 70)))
        assert len(peaks["clip"]) == 1


class TestAccumulateResults:
    def test_false_returns_none_but_callbacks_fire(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        peaks, total = det.find_clip_in_audio(
            stream_of(make_audio(clip, [5.0], 70)),
            on_pattern_detected=lambda n, t: events.append(t),
            accumulate_results=False,
        )
        assert peaks is None
        assert len(events) == 1
        assert total == 70.0


class TestGetConfig:
    def test_schema(self):
        clip = make_clip(seconds=2.5, name="c1")
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=None)
        cfg = det.get_config()
        assert cfg["default_seconds_per_chunk"] == DEFAULT_SECONDS_PER_CHUNK
        assert cfg["sample_rate"] == SR
        assert cfg["min_chunk_size_seconds"] == 6  # ceil(2.5)*2
        assert cfg["clips"]["c1"]["duration_seconds"] == 2.5
        assert cfg["clips"]["c1"]["sliding_window_seconds"] == 3

    def test_multiple_clips(self):
        det = AudioPatternDetector(
            audio_clips=[make_clip(1.0, "a"), make_clip(4.2, "b")],
        )
        cfg = det.get_config()
        assert set(cfg["clips"]) == {"a", "b"}
        assert cfg["min_chunk_size_seconds"] == 10
