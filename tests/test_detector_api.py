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


class TestChunkSizeF32Bound:
    """Device payloads (peak positions, length constants) cross the
    host<->device boundary as float32, exact only below 2**24; configs
    whose sample positions could round must be rejected up front with
    the user-facing knobs in the message."""

    def _clip_at(self, sr):
        t = np.arange(sr) / sr
        return AudioClip(
            name="c",
            audio=(0.5 * np.sin(2 * np.pi * 523 * t)).astype(np.float32),
            sample_rate=sr,
        )

    def test_oversize_chunk_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="float32 exactness"):
            AudioPatternDetector(
                audio_clips=[self._clip_at(44100)],
                seconds_per_chunk=400,
                target_sample_rate=44100,
            )

    def test_bound_is_rate_dependent(self):
        # The same 400 s chunk is fine at 8 kHz (3.2M samples << 2**24)...
        det = AudioPatternDetector(
            audio_clips=[self._clip_at(SR)], seconds_per_chunk=400
        )
        assert det.seconds_per_chunk == 400
        # ...and a 44.1 kHz config just below the bound still constructs.
        det = AudioPatternDetector(
            audio_clips=[self._clip_at(44100)],
            seconds_per_chunk=370,
            target_sample_rate=44100,
        )
        assert det.seconds_per_chunk == 370


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


class CountingStream:
    """BytesIO wrapper counting read() calls, to pin streaming emission."""

    def __init__(self, audio):
        self._io = io.BytesIO(audio.astype(np.float32).tobytes())
        self.reads = 0

    def read(self, n=-1):
        self.reads += 1
        return self._io.read(n)


class TestCallbackImmediacy:
    def test_events_fire_during_streaming_not_at_end(self):
        """A match in chunk 0 of a 4-chunk stream must be emitted while the
        stream is still being consumed (streaming contract; reference:
        tests/test_detector_api.py:363-393). The double-buffered loop defers
        each chunk's emission by exactly one chunk, so the chunk-0 match
        fires right after chunk 1's read — well before EOF."""
        clip = make_clip()
        raw = CountingStream(make_audio(clip, [5.0], 240))
        stream = AudioStream(name="synth", audio_stream=raw, sample_rate=SR)
        fired_at = []
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=60)
        det.find_clip_in_audio(
            stream, on_pattern_detected=lambda n, t: fired_at.append(raw.reads)
        )
        assert fired_at, "expected one detection"
        # 4 chunks -> 5 reads total (incl. EOF read). Chunk 0's match must
        # fire by read 2 (chunk 1 in flight), not at stream end.
        assert fired_at[0] <= 2, f"emission deferred to read {fired_at[0]}"

    def test_emission_counter_order(self):
        clip = make_clip()
        order = []
        counter = [0]

        def cb(name, ts):
            counter[0] += 1
            order.append((counter[0], ts))

        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=60)
        det.find_clip_in_audio(
            stream_of(make_audio(clip, [5.0, 100.0], 130)), on_pattern_detected=cb
        )
        assert [n for n, _ in order] == [1, 2]
        assert order[0][1] < order[1][1]

    def test_callback_exact_equality_with_accumulated(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        peaks, _ = det.find_clip_in_audio(
            stream_of(make_audio(clip, [5.0, 65.0], 130)),
            on_pattern_detected=lambda n, t: events.append((n, t)),
            accumulate_results=True,
        )
        accumulated = sorted((n, t) for n, ts in peaks.items() for t in ts)
        assert sorted(events) == accumulated  # identical floats, not approx

    def test_no_match_fires_nothing_but_keys_exist(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        audio = (0.01 * np.random.default_rng(3).standard_normal(70 * SR)).astype(
            np.float32
        )
        peaks, total = det.find_clip_in_audio(
            stream_of(audio), on_pattern_detected=lambda n, t: events.append(t)
        )
        assert events == []
        assert peaks == {"clip": []}
        assert total == 70.0

    def test_no_match_accumulate_false(self):
        clip = make_clip()
        events = []
        det = AudioPatternDetector(audio_clips=[clip])
        audio = (0.01 * np.random.default_rng(3).standard_normal(70 * SR)).astype(
            np.float32
        )
        peaks, total = det.find_clip_in_audio(
            stream_of(audio),
            on_pattern_detected=lambda n, t: events.append(t),
            accumulate_results=False,
        )
        assert events == []
        assert peaks is None
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

    def test_default_seconds_per_chunk_is_constant(self):
        """default_seconds_per_chunk reports the engine constant regardless
        of the configured or auto-computed chunk size (reference:
        tests/test_detector_api.py:447-465)."""
        clip = make_clip(seconds=2.5)
        for spc in (None, 30, DEFAULT_SECONDS_PER_CHUNK):
            det = AudioPatternDetector(
                audio_clips=[make_clip(seconds=2.5)], seconds_per_chunk=spc
            )
            cfg = det.get_config()
            assert cfg["default_seconds_per_chunk"] == DEFAULT_SECONDS_PER_CHUNK
        del clip

    def test_field_types(self):
        det = AudioPatternDetector(audio_clips=[make_clip(1.3, "c")])
        cfg = det.get_config()
        assert isinstance(cfg["clips"]["c"]["duration_seconds"], float)
        assert isinstance(cfg["clips"]["c"]["sliding_window_seconds"], int)
        assert cfg["clips"]["c"]["sliding_window_seconds"] == 2

    def test_min_chunk_is_max_over_clips(self):
        det = AudioPatternDetector(
            audio_clips=[make_clip(0.3, "s"), make_clip(3.7, "l"), make_clip(1.9, "m")],
        )
        cfg = det.get_config()
        per_clip_min = {
            name: 2 * c["sliding_window_seconds"] for name, c in cfg["clips"].items()
        }
        assert cfg["min_chunk_size_seconds"] == max(per_clip_min.values()) == 8


class TestGetConfigGoldenCorpus:
    """get_config over the shipped corpus patterns (reference:
    tests/test_detector_api.py:431-594)."""

    def _corpus_clip(self, rel):
        import os

        from tests.conftest import SAMPLE_AUDIOS

        return AudioClip.from_audio_file(os.path.join(SAMPLE_AUDIOS, "clips", rel))

    def test_rthk_marker_clip_config(self):
        import math

        clip = self._corpus_clip("rthk_beep.apd.toml")
        cfg = AudioPatternDetector(audio_clips=[clip]).get_config()
        c = cfg["clips"]["rthk_beep"]
        assert c["duration_seconds"] < 0.5  # short marker tone
        assert c["sliding_window_seconds"] == math.ceil(c["duration_seconds"]) == 1
        assert cfg["sample_rate"] == 8000
        assert cfg["min_chunk_size_seconds"] == 2

    def test_multi_corpus_clips_all_present(self):
        import math

        clips = [
            self._corpus_clip("rthk_beep.apd.toml"),
            self._corpus_clip("cbs_news.wav"),
            self._corpus_clip("天空下的彩虹intro.wav"),
        ]
        cfg = AudioPatternDetector(audio_clips=clips).get_config()
        assert set(cfg["clips"]) == {"rthk_beep", "cbs_news", "天空下的彩虹intro"}
        for c in cfg["clips"].values():
            assert c["sliding_window_seconds"] == math.ceil(c["duration_seconds"])
        assert cfg["min_chunk_size_seconds"] == max(
            2 * c["sliding_window_seconds"] for c in cfg["clips"].values()
        )
