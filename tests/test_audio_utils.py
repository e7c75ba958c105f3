"""Audio I/O utilities: WAV decode paths, resample, slicing.

Mirrors reference unit coverage (reference: tests/test_audio_utils.py and
tests/test_slicing.py).
"""

import io
import wave

import numpy as np
import pytest

from audio_pattern_detector_tpu.utils.audio_io import (
    is_ffmpeg_available,
    load_wav_file,
    load_wav_from_bytes,
    load_wave_file,
    resample_audio,
    slicing_with_zero_padding,
    write_wav_file,
)

SR = 8000


def wav_bytes(audio, sr, sampwidth=2, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        if sampwidth == 2:
            data = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
        elif sampwidth == 4:
            data = np.clip(audio * 2147483647, -2147483648, 2147483647).astype(np.int32)
        elif sampwidth == 1:
            data = np.clip(audio * 127 + 128, 0, 255).astype(np.uint8)
        elif sampwidth == 3:
            i32 = np.clip(audio * 8388607, -8388608, 8388607).astype(np.int32)
            b = np.zeros((len(i32), 3), dtype=np.uint8)
            b[:, 0] = i32 & 0xFF
            b[:, 1] = (i32 >> 8) & 0xFF
            b[:, 2] = (i32 >> 16) & 0xFF
            wf.writeframes(b.tobytes())
            return buf.getvalue()
        wf.writeframes(data.tobytes())
    return buf.getvalue()


class TestWavDecode:
    @pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
    def test_bit_depths(self, sampwidth):
        t = np.arange(SR) / SR
        audio = 0.5 * np.sin(2 * np.pi * 440 * t)
        decoded, sr = load_wav_from_bytes(wav_bytes(audio, SR, sampwidth))
        assert sr == SR
        tol = {1: 2e-2, 2: 1e-3, 3: 1e-5, 4: 1e-7}[sampwidth]
        np.testing.assert_allclose(decoded, audio, atol=tol)

    def test_stereo_mean_mix(self):
        t = np.arange(100) / SR
        left = 0.5 * np.sin(2 * np.pi * 440 * t)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(SR)
            inter = np.empty(200)
            inter[0::2] = left
            inter[1::2] = -left
            wf.writeframes((inter * 32767).astype(np.int16).tobytes())
        decoded, _ = load_wav_from_bytes(buf.getvalue())
        np.testing.assert_allclose(decoded, 0.0, atol=1e-4)

    def test_write_read_roundtrip(self, tmp_path):
        t = np.arange(SR) / SR
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "out.wav")
        write_wav_file(p, audio, SR)
        decoded, sr = load_wav_file(p)
        assert sr == SR
        np.testing.assert_allclose(decoded, audio, atol=1e-3)

    def test_invalid_wav_rejected(self):
        with pytest.raises(ValueError, match="Failed to read WAV"):
            load_wav_from_bytes(b"not a wav file at all")


class TestResampleAudio:
    def test_noop_same_rate(self):
        x = np.ones(100, dtype=np.float32)
        assert resample_audio(x, SR, SR) is x

    def test_preserves_frequency(self):
        t = np.arange(2 * 16000) / 16000
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = resample_audio(x, 16000, SR)
        assert len(y) == 2 * SR
        spec = np.abs(np.fft.rfft(y))
        freqs = np.fft.rfftfreq(len(y), 1 / SR)
        assert abs(freqs[np.argmax(spec)] - 440) < 2

    def test_length_scaling(self):
        x = np.zeros(1000, dtype=np.float32)
        assert len(resample_audio(x, 16000, SR)) == 500

    def test_upsample_length_and_frequency(self):
        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = resample_audio(x, SR, 16000)
        assert len(y) == 16000
        spec = np.abs(np.fft.rfft(y))
        freqs = np.fft.rfftfreq(len(y), 1 / 16000)
        assert abs(freqs[np.argmax(spec)] - 440) < 2


class TestLoadWaveFile:
    """The any-format loader: WAV native decode + resample; non-WAV needs
    ffmpeg (reference: tests/test_audio_utils.py:57-127,274-307)."""

    def _write(self, tmp_path, audio, sr, name="x.wav"):
        p = str(tmp_path / name)
        write_wav_file(p, audio.astype(np.float32), sr)
        return p

    def test_loads_at_expected_rate(self, tmp_path):
        t = np.arange(SR) / SR
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = self._write(tmp_path, tone, SR)
        out = load_wave_file(path, SR)
        assert len(out) == SR
        assert out.dtype == np.float32

    def test_resamples_when_rates_differ(self, tmp_path):
        t = np.arange(16000) / 16000
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = self._write(tmp_path, tone, 16000)
        out = load_wave_file(path, SR)
        assert len(out) == SR
        spec = np.abs(np.fft.rfft(out))
        freqs = np.fft.rfftfreq(len(out), 1 / SR)
        assert abs(freqs[np.argmax(spec)] - 440) < 2

    def test_nonexistent_file_raises(self):
        with pytest.raises(ValueError, match="Failed to read WAV data"):
            load_wave_file("/no/such/file.wav", SR)

    def test_non_wav_without_ffmpeg_raises(self, tmp_path, monkeypatch):
        import audio_pattern_detector_tpu.utils.audio_io as aio

        monkeypatch.setattr(aio, "_ffmpeg_available", False)
        p = tmp_path / "x.opus"
        p.write_bytes(b"not audio")
        with pytest.raises(ValueError, match="ffmpeg not available"):
            load_wave_file(str(p), SR)

    def test_wav_decodes_without_ffmpeg(self, tmp_path, monkeypatch):
        """WAV patterns never need ffmpeg (reference:
        tests/test_integration_matching.py:1239-1260)."""
        import audio_pattern_detector_tpu.utils.audio_io as aio

        monkeypatch.setattr(aio, "_ffmpeg_available", False)
        tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(SR) / SR)).astype(np.float32)
        path = self._write(tmp_path, tone, SR)
        out = load_wave_file(path, SR)
        assert len(out) == SR


class TestFfmpegAvailability:
    def test_returns_bool(self):
        assert isinstance(is_ffmpeg_available(), bool)

    def test_cached_across_calls(self, monkeypatch):
        import audio_pattern_detector_tpu.utils.audio_io as aio

        calls = []
        monkeypatch.setattr(aio, "_ffmpeg_available", None)
        monkeypatch.setattr(
            aio.subprocess,
            "run",
            lambda *a, **k: calls.append(1) or type("R", (), {})(),
        )
        first = aio.is_ffmpeg_available()
        second = aio.is_ffmpeg_available()
        assert first is second is True
        assert len(calls) == 1  # probe executed once, then cached


class TestWriteWavFile:
    @pytest.mark.parametrize("sr", [8000, 16000, 44100])
    def test_roundtrip_at_rates(self, tmp_path, sr):
        tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)).astype(
            np.float32
        )
        p = str(tmp_path / f"t{sr}.wav")
        write_wav_file(p, tone, sr)
        audio, got_sr = load_wav_file(p)
        assert got_sr == sr
        assert len(audio) == len(tone)
        assert np.max(np.abs(audio - tone)) < 1e-3  # 16-bit quantisation


class TestSlicing:
    """Center slice with asymmetric floor/ceil zero padding
    (reference: audio_utils.py:177-191, tests/test_slicing.py)."""

    def test_centered_no_padding(self):
        x = np.arange(10, dtype=np.float32)
        out = slicing_with_zero_padding(x, 4, 5)
        np.testing.assert_array_equal(out, [3, 4, 5, 6])

    def test_odd_width(self):
        x = np.arange(10, dtype=np.float32)
        out = slicing_with_zero_padding(x, 5, 5)
        np.testing.assert_array_equal(out, [3, 4, 5, 6, 7])

    def test_left_padding(self):
        x = np.arange(10, dtype=np.float32)
        out = slicing_with_zero_padding(x, 6, 1)
        np.testing.assert_array_equal(out, [0, 0, 0, 1, 2, 3])

    def test_right_padding(self):
        x = np.arange(10, dtype=np.float32)
        out = slicing_with_zero_padding(x, 6, 9)
        np.testing.assert_array_equal(out, [6, 7, 8, 9, 0, 0])

    def test_both_sides_padding(self):
        x = np.ones(3, dtype=np.float32)
        out = slicing_with_zero_padding(x, 9, 1)
        assert len(out) == 9
        assert out.sum() == 3

    def test_length_always_width(self):
        x = np.arange(50, dtype=np.float32)
        for width in [1, 2, 7, 49, 50, 51, 101]:
            for mid in [0, 10, 49]:
                assert len(slicing_with_zero_padding(x, width, mid)) == width
