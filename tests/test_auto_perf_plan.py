"""File-mode auto-perf launch plan: 60 s chunks + balanced scan-batching.

Round-5 default (match.py::_auto_perf_plan): the flag-free file path keeps
the 60 s chunk geometry and amortises per-launch round trips by batching
consecutive chunks per launch (measured strictly better than the old
enlarge-chunks-to-120 s policy, docs/scaling.md "Round-4 close-out of the
big-chunk question"). These tests pin the plan math (balanced widths,
unknown-duration fallback, clip-length floors) and the end-to-end identity
of the auto-batched default against an explicit serial 60 s run.
"""

import os
import wave

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip
from audio_pattern_detector_tpu import match as m

SR = 8000


def _clip(seconds=1.0, seed=7, name="c"):
    rng = np.random.default_rng(seed)
    return AudioClip(
        name=name,
        audio=(0.4 * rng.standard_normal(int(seconds * SR))).astype(np.float32),
        sample_rate=SR,
    )


def _write_wav(path, audio_f32, sr=SR):
    pcm = np.clip(np.round(audio_f32 * 32768.0), -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


class TestPlanMath:
    def _plan_for_duration(self, monkeypatch, duration, clips=None):
        monkeypatch.setattr(m, "_probe_duration_seconds", lambda src: duration)
        return m._auto_perf_plan("x.wav", clips if clips is not None else [], SR)

    def test_unknown_duration_keeps_serial_default(self, monkeypatch):
        """Unprobeable source: batching blind would zero-pad up to B-1
        chunks on a sub-minute file, so the plan stays (60, 1)."""
        assert self._plan_for_duration(monkeypatch, None) == (60, 1)

    def test_short_file_single_chunk(self, monkeypatch):
        assert self._plan_for_duration(monkeypatch, 45.0) == (60, 1)
        assert self._plan_for_duration(monkeypatch, 60.0) == (60, 1)

    def test_small_file_one_launch(self, monkeypatch):
        # 150 s -> 3 chunks, one launch of 3 (not 3-padded-to-8)
        assert self._plan_for_duration(monkeypatch, 150.0) == (60, 3)

    def test_balanced_width_avoids_padding(self, monkeypatch):
        # 9 chunks -> 2 launches of 5 (1 padded row), NOT 8 + 1-padded-to-8
        assert self._plan_for_duration(monkeypatch, 540.0) == (60, 5)
        # 17 chunks -> 3 launches of 6
        assert self._plan_for_duration(monkeypatch, 1000.0) == (60, 6)

    def test_long_file_full_width(self, monkeypatch):
        # 100 chunks -> 13 launches of 8 (the measured stream-batch width)
        assert self._plan_for_duration(monkeypatch, 6000.0) == (60, 8)

    def test_long_clip_raises_chunk_floor_and_rebalances(self, monkeypatch):
        # A 70 s clip needs >= 140 s chunks (2x sliding window, reference
        # audio_pattern_detector.py:122-136); 500 s -> 4 chunks, 1 launch.
        clip = AudioClip(
            name="long",
            audio=np.zeros(int(70 * SR), dtype=np.float32),
            sample_rate=SR,
        )
        assert self._plan_for_duration(monkeypatch, 500.0, [clip]) == (140, 4)

    def test_probe_failure_modes_fall_back(self, monkeypatch, tmp_path):
        """Corrupt WAV headers and missing ffprobe degrade to unknown."""
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"RIFFnope")
        assert m._probe_duration_seconds(str(bad)) is None
        from audio_pattern_detector_tpu.utils import audio_io

        def missing(path):
            raise FileNotFoundError("ffprobe")

        monkeypatch.setattr(audio_io, "get_audio_duration", missing)
        assert m._probe_duration_seconds(str(tmp_path / "x.opus")) is None


class TestAutoPerfEndToEnd:
    def test_auto_batched_default_equals_explicit_serial(self, tmp_path):
        """The flag-free file path (auto plan: 60 s chunks, batch 3 for a
        150 s file) produces byte-identical results and callback order to
        an explicit serial --chunk-seconds 60 run."""
        clip = _clip()
        rng = np.random.default_rng(3)
        audio = (0.01 * rng.standard_normal(150 * SR)).astype(np.float32)
        for off in (30.0, 70.5, 130.0):  # one hit per 60 s chunk
            s = int(off * SR)
            audio[s : s + len(clip.audio)] += clip.audio
        wav = tmp_path / "stream.wav"
        _write_wav(wav, audio)
        pat = tmp_path / "c.wav"
        _write_wav(pat, clip.audio)

        def run(**kwargs):
            events = []
            res = m.match_pattern(
                str(wav),
                [str(pat)],
                accumulate_results=True,
                on_pattern_detected=lambda name, t: events.append((name, t)),
                **kwargs,
            )
            return res, events

        auto = run(chunk_seconds_auto_perf=True)
        serial = run(seconds_per_chunk=60)
        assert auto == serial
        assert sum(len(v) for v in auto[0][0].values()) == 3

    def test_flag_free_run_applies_plan_batch(self, tmp_path, monkeypatch):
        """The flag-free default hands the engine the plan's batch width
        (130 s file -> 3 chunks -> one launch of 3)."""
        captured = {}
        real = m.AudioPatternDetector.find_clip_in_audio

        def spy(self, stream, **kwargs):
            captured.update(kwargs)
            return real(self, stream, **kwargs)

        monkeypatch.setattr(m.AudioPatternDetector, "find_clip_in_audio", spy)
        clip = _clip()
        audio = np.zeros(130 * SR, dtype=np.float32)
        wav = tmp_path / "s.wav"
        _write_wav(wav, audio)
        pat = tmp_path / "c.wav"
        _write_wav(pat, clip.audio)
        m.match_pattern(
            str(wav),
            [str(pat)],
            accumulate_results=True,
            chunk_seconds_auto_perf=True,
        )
        assert captured["stream_batch"] == 3
        assert captured["pipeline_depth"] == 3

    def test_explicit_stream_batch_not_overridden(self, tmp_path, monkeypatch):
        """An explicit --stream-batch keeps the user's width; auto-perf
        only swaps the big-chunk policy for the 60 s geometry."""
        captured = {}
        real = m.AudioPatternDetector.find_clip_in_audio

        def spy(self, stream, **kwargs):
            captured.update(kwargs)
            return real(self, stream, **kwargs)

        monkeypatch.setattr(m.AudioPatternDetector, "find_clip_in_audio", spy)
        clip = _clip()
        audio = np.zeros(130 * SR, dtype=np.float32)
        wav = tmp_path / "s.wav"
        _write_wav(wav, audio)
        pat = tmp_path / "c.wav"
        _write_wav(pat, clip.audio)
        m.match_pattern(
            str(wav),
            [str(pat)],
            accumulate_results=True,
            chunk_seconds_auto_perf=True,
            stream_batch=2,
        )
        assert captured["stream_batch"] == 2


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([os.path.abspath(__file__), "-v"]))
