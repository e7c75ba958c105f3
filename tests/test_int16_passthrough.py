"""int16 passthrough: raw 16-bit PCM streams ride to the device unpacked.

A 16-bit mono WAV at the target rate (the dominant real source) streams
its raw int16 bytes through the engine: no host f32 decode, no packed-
upload re-quantise — the device unpack IS the bitwise-pinned decode
(ops/packing.py), so results must be IDENTICAL to the decoded-f32 path
in every mode (streaming, pipelined, stream-batch, offline-batch,
checkpointed). Reference anchor: the decode the reference always pays,
match.py:253-265.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

from audio_pattern_detector_tpu import (
    AudioClip,
    AudioPatternDetector,
    AudioStream,
)

SR = 8000
CHUNK_S = 5


def _pcm16(arr: np.ndarray) -> np.ndarray:
    return np.clip(np.round(arr * 32768.0), -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def fixture_audio():
    """(clip, int16 audio with 4 embedded hits) on the PCM16 grid."""
    rng = np.random.default_rng(23)
    clip = AudioClip(
        name="c",
        audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = 0.01 * rng.standard_normal(31 * SR)
    for off in [2.0, 9.5, 17.0, 26.25]:
        o = int(off * SR)
        audio[o : o + SR] += 0.9 * clip.audio
    return clip, _pcm16(audio)


def _det(clip) -> AudioPatternDetector:
    return AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=CHUNK_S)


def _stream_i16(audio_i16: np.ndarray) -> AudioStream:
    return AudioStream(
        name="s",
        audio_stream=io.BytesIO(audio_i16.tobytes()),
        sample_rate=SR,
        sample_dtype=np.int16,
    )


def _stream_f32(audio_i16: np.ndarray) -> AudioStream:
    f32 = (audio_i16.astype(np.float32) / np.float32(32768.0)).astype(
        np.float32
    )
    return AudioStream(
        name="s", audio_stream=io.BytesIO(f32.tobytes()), sample_rate=SR
    )


class TestEngineIdentity:
    def test_streaming_identical_to_f32(self, fixture_audio):
        clip, audio_i16 = fixture_audio
        r16, t16 = _det(clip).find_clip_in_audio(_stream_i16(audio_i16))
        r32, t32 = _det(clip).find_clip_in_audio(_stream_f32(audio_i16))
        assert r16 == r32
        assert t16 == t32
        assert len(set(r16["c"])) == 4

    def test_pipelined_and_stream_batch_identical(self, fixture_audio):
        clip, audio_i16 = fixture_audio
        base, t0 = _det(clip).find_clip_in_audio(_stream_f32(audio_i16))
        piped, t1 = _det(clip).find_clip_in_audio(
            _stream_i16(audio_i16), pipeline_depth=3
        )
        batched, t2 = _det(clip).find_clip_in_audio(
            _stream_i16(audio_i16), stream_batch=3, pipeline_depth=2
        )
        assert piped == batched == base
        assert t0 == t1 == t2

    def test_offline_batch_identical(self, fixture_audio):
        clip, audio_i16 = fixture_audio
        r32, t32 = _det(clip).find_clip_in_array(
            audio_i16.astype(np.float32) / np.float32(32768.0), batch_size=3
        )
        r16, t16 = _det(clip).find_clip_in_array(audio_i16, batch_size=3)
        r16v, _ = _det(clip).find_clip_in_array(
            audio_i16, batch_size=3, batch_mode="vmap"
        )
        assert r16 == r16v == r32
        assert t16 == t32

    def test_checkpoint_tails_serialize_as_f32(self, fixture_audio):
        clip, audio_i16 = fixture_audio
        seen = []
        _det(clip).find_clip_in_audio(
            _stream_i16(audio_i16), on_checkpoint=seen.append
        )
        assert seen
        for ck in seen[1:]:
            assert ck.previous_tail is not None
            assert ck.previous_tail.dtype == np.float32
            # to_bytes must round-trip the tail bit-for-bit (the f32
            # serialization contract — raw int16 VALUES would corrupt it).
            rt = type(ck).from_bytes(ck.to_bytes())
            assert np.array_equal(rt.previous_tail, ck.previous_tail)

    def test_checkpoint_resume_identical(self, fixture_audio, tmp_path):
        clip, audio_i16 = fixture_audio
        serial, t_serial = _det(clip).find_clip_in_audio(
            _stream_i16(audio_i16)
        )

        # Interrupt after 3 chunks, then resume from the checkpoint with
        # the stream positioned at the boundary — int16 both sides.
        cks = []
        first_events: dict[str, list[float]] = {}

        def stop_after(ck):
            cks.append(ck)
            if ck.chunk_index == 3:
                raise KeyboardInterrupt

        det = _det(clip)
        with pytest.raises(KeyboardInterrupt):
            det.find_clip_in_audio(
                _stream_i16(audio_i16),
                on_checkpoint=stop_after,
                on_pattern_detected=lambda n, t: first_events.setdefault(
                    n, []
                ).append(t),
            )
        resume = cks[-1]
        assert resume.chunk_index == 3
        rest = audio_i16[3 * CHUNK_S * SR :]
        r2, t2 = _det(clip).find_clip_in_audio(
            _stream_i16(rest), checkpoint=resume
        )
        combined = {
            n: sorted(first_events.get(n, []) + r2[n]) for n in serial
        }
        assert combined == {n: sorted(v) for n, v in serial.items()}
        assert t2 == t_serial


class TestWrapperSelection:
    def _wav(self, path, arr_i16, sr=SR, channels=1, sampwidth=2):
        import wave

        with wave.open(str(path), "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(sampwidth)
            w.setframerate(sr)
            w.writeframes(arr_i16.tobytes())

    def test_16bit_mono_target_rate_is_passthrough(self, tmp_path, fixture_audio):
        from audio_pattern_detector_tpu.match import _WavFileStreamWrapper

        _, audio_i16 = fixture_audio
        p = tmp_path / "a.wav"
        self._wav(p, audio_i16)
        wr = _WavFileStreamWrapper(str(p), SR)
        assert wr.output_dtype == np.int16
        data = wr.read(SR * 2)
        assert np.array_equal(
            np.frombuffer(data, np.int16), audio_i16[:SR]
        )
        wr.close()

    def test_resampled_and_stereo_stay_f32(self, tmp_path, fixture_audio):
        from audio_pattern_detector_tpu.match import _WavFileStreamWrapper

        _, audio_i16 = fixture_audio
        p16k = tmp_path / "b16k.wav"
        self._wav(p16k, audio_i16, sr=16000)
        assert _WavFileStreamWrapper(str(p16k), SR).output_dtype == np.float32

        stereo = np.repeat(audio_i16[: SR], 2)
        pst = tmp_path / "st.wav"
        self._wav(pst, stereo, channels=2)
        assert _WavFileStreamWrapper(str(pst), SR).output_dtype == np.float32

    def test_all_zero_first_chunk_still_warns(self, tmp_path, capsys):
        from audio_pattern_detector_tpu.match import _WavFileStreamWrapper

        p = tmp_path / "z.wav"
        self._wav(p, np.zeros(SR, np.int16))
        wr = _WavFileStreamWrapper(str(p), SR)
        wr.read(SR * 2)
        assert "all zeros" in capsys.readouterr().err
        wr.close()

    def test_match_pattern_passthrough_equals_decoded_path(
        self, tmp_path, fixture_audio, monkeypatch
    ):
        """CLI-level identity: the same 16-bit WAV scanned with the
        passthrough engaged and with it force-disabled (the old
        decode-to-f32 path) emits identical detections and total time."""
        from audio_pattern_detector_tpu import match as match_mod
        from audio_pattern_detector_tpu.match import match_pattern

        clip, audio_i16 = fixture_audio
        clip_path = tmp_path / "clip.wav"
        self._wav(clip_path, _pcm16(clip.audio))
        p16 = tmp_path / "a16.wav"
        self._wav(p16, audio_i16)

        r16, t16 = match_pattern(
            str(p16), [str(clip_path)], seconds_per_chunk=CHUNK_S
        )

        orig_init = match_mod._WavFileStreamWrapper.__init__

        def no_passthrough(self, *a, **k):
            orig_init(self, *a, **k)
            self.output_dtype = np.float32
            self._bytes_per_sample = 4

        monkeypatch.setattr(
            match_mod._WavFileStreamWrapper, "__init__", no_passthrough
        )
        r32, t32 = match_pattern(
            str(p16), [str(clip_path)], seconds_per_chunk=CHUNK_S
        )
        assert r16 == r32
        assert t16 == t32
        assert len(set(r16["clip"])) == 4
