"""Stream wrapper unit coverage: file wrapper decode/resample/warnings,
no-ffmpeg operation, duration accounting.

Mirrors reference wrapper coverage (reference:
tests/test_integration_matching.py:1040-1341, 1239-1260).
"""

import io
import wave

import numpy as np
import pytest

from audio_pattern_detector_tpu.match import _WavFileStreamWrapper
from audio_pattern_detector_tpu.utils import audio_io

SR = 8000


def write_wav(path, audio, sr, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        if channels > 1:
            audio = audio.reshape(-1)
        if sampwidth == 2:
            data = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
        elif sampwidth == 1:
            data = np.clip(audio * 127 + 128, 0, 255).astype(np.uint8)
        else:
            data = np.clip(audio * 2147483647, -(2**31), 2**31 - 1).astype(np.int32)
        wf.writeframes(data.tobytes())


class TestWavFileStreamWrapper:
    def test_reads_int16_passthrough_at_target_rate(self, tmp_path):
        """A 16-bit mono file at the target rate streams RAW int16 bytes
        (output_dtype int16 — the engine passthrough fast path); decoded
        they match the source samples."""
        t = np.arange(2 * SR) / SR
        audio = 0.5 * np.sin(2 * np.pi * 440 * t)
        p = tmp_path / "a.wav"
        write_wav(p, audio, SR)
        w = _WavFileStreamWrapper(str(p), SR)
        assert w.output_dtype == np.int16
        out = np.frombuffer(w.read(2 * SR * 2), dtype=np.int16)
        w.close()
        np.testing.assert_allclose(
            out.astype(np.float32) / 32768.0, audio, atol=1e-3
        )

    def test_incremental_resample_16k_to_8k(self, tmp_path):
        t = np.arange(2 * 16000) / 16000
        audio = 0.5 * np.sin(2 * np.pi * 440 * t)
        p = tmp_path / "b.wav"
        write_wav(p, audio, 16000)
        w = _WavFileStreamWrapper(str(p), SR)
        assert w.needs_resample
        chunks = []
        while True:
            b = w.read(SR * 4)  # 1 s at target rate per read
            if not b:
                break
            chunks.append(np.frombuffer(b, dtype=np.float32))
        w.close()
        out = np.concatenate(chunks)
        assert len(out) == 2 * SR
        spec = np.abs(np.fft.rfft(out))
        freqs = np.fft.rfftfreq(len(out), 1 / SR)
        assert abs(freqs[np.argmax(spec)] - 440) < 2

    def test_stereo_mean_mix(self, tmp_path, capsys):
        n = SR
        left = 0.5 * np.ones(n)
        inter = np.empty(2 * n)
        inter[0::2] = left
        inter[1::2] = -left
        p = tmp_path / "st.wav"
        write_wav(p, inter, SR, channels=2)
        w = _WavFileStreamWrapper(str(p), SR)
        out = np.frombuffer(w.read(n * 4), dtype=np.float32)
        w.close()
        np.testing.assert_allclose(out, 0.0, atol=1e-4)

    def test_all_zero_first_chunk_warns(self, tmp_path, capsys):
        p = tmp_path / "z.wav"
        write_wav(p, np.zeros(SR), SR)
        w = _WavFileStreamWrapper(str(p), SR)
        w.read(SR * 4)
        w.close()
        assert "all zeros" in capsys.readouterr().err

    def test_invalid_file_raises(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"definitely not a wav")
        with pytest.raises(ValueError, match="Failed to read WAV"):
            _WavFileStreamWrapper(str(p), SR)

    def test_8bit_decode(self, tmp_path):
        t = np.arange(SR) / SR
        audio = 0.5 * np.sin(2 * np.pi * 440 * t)
        p = tmp_path / "u8.wav"
        write_wav(p, audio, SR, sampwidth=1)
        w = _WavFileStreamWrapper(str(p), SR)
        out = np.frombuffer(w.read(SR * 4), dtype=np.float32)
        w.close()
        np.testing.assert_allclose(out, audio, atol=2e-2)


def build_wav_header(
    fmt=1, channels=1, rate=SR, bits=16, pre_fmt_chunks=(), post_fmt_chunks=()
) -> bytes:
    """Hand-built RIFF stream for header-walk tests."""
    import struct

    body = b""
    for cid, payload in pre_fmt_chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
    block_align = channels * bits // 8
    fmt_payload = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * block_align, block_align, bits
    )
    body += b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
    for cid, payload in post_fmt_chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
    body += b"data" + struct.pack("<I", 0)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestStdinHeaderValidation:
    """RIFF-walk contracts of the stdin wrapper (reference: match.py:215-283,
    tests/test_cli_integration.py:506-553)."""

    def _validate(self, raw: bytes):
        from audio_pattern_detector_tpu.match import _validate_wav_header

        return _validate_wav_header(io.BytesIO(raw), SR)

    def test_int16_accepted(self):
        assert self._validate(build_wav_header(fmt=1, bits=16)) == (1, 16)

    def test_int32_accepted(self):
        assert self._validate(build_wav_header(fmt=1, bits=32)) == (1, 32)

    def test_float32_accepted(self):
        assert self._validate(build_wav_header(fmt=3, bits=32)) == (3, 32)

    def test_24bit_pcm_rejected(self):
        with pytest.raises(ValueError, match="16-bit or 32-bit"):
            self._validate(build_wav_header(fmt=1, bits=24))

    def test_float16_rejected(self):
        with pytest.raises(ValueError, match="32-bit float"):
            self._validate(build_wav_header(fmt=3, bits=16))

    def test_alaw_format_rejected(self):
        with pytest.raises(ValueError, match="PCM .1. or IEEE float"):
            self._validate(build_wav_header(fmt=6))

    def test_stereo_rejected(self):
        with pytest.raises(ValueError, match="mono"):
            self._validate(build_wav_header(channels=2))

    def test_wrong_rate_rejected(self):
        with pytest.raises(ValueError, match="Expected 8000 Hz, got 44100"):
            self._validate(build_wav_header(rate=44100))

    def test_not_riff_rejected(self):
        with pytest.raises(ValueError, match="expected RIFF"):
            self._validate(b"OGGS" + b"\0" * 40)

    def test_extra_chunks_skipped(self):
        # ffmpeg-style LIST metadata before fmt and a fact chunk before data
        # must be walked over, not rejected.
        raw = build_wav_header(
            pre_fmt_chunks=((b"LIST", b"INFOmeta"),),
            post_fmt_chunks=((b"fact", b"\x00\x00\x00\x00"),),
        )
        assert self._validate(raw) == (1, 16)

    def test_odd_sized_chunk_pad_byte_skipped(self):
        """RIFF chunks are word-aligned: an odd-sized chunk carries one pad
        byte that the walk must consume or every later read desyncs by a
        byte. (The reference parser lacks the pad skip and rejects these
        spec-conformant WAVs; accepting them is a strict superset —
        docs/reference-parity.md.)"""
        import struct

        fmt_payload = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
        body = (
            b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
            + b"fmt " + struct.pack("<I", 16) + fmt_payload
            + b"id3 " + struct.pack("<I", 5) + b"hello" + b"\x00"  # odd + pad
            + b"data" + struct.pack("<I", 0)
        )
        raw = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        assert self._validate(raw) == (1, 16)

    def test_stdin_truncated_mid_sample_ends_cleanly(self, monkeypatch, capsys):
        """An int16 stream cut mid-sample (writer died) must end the
        stream with a warning, not crash np.frombuffer on an odd byte
        count."""
        import sys as _sys
        import types

        from audio_pattern_detector_tpu.match import _WavStdinStreamWrapper

        samples = np.array([100, -200, 300], dtype=np.int16).tobytes()
        raw = build_wav_header(fmt=1, bits=16) + samples[:-1]  # 2.5 samples
        monkeypatch.setattr(
            _sys, "stdin", types.SimpleNamespace(buffer=io.BytesIO(raw))
        )
        w = _WavStdinStreamWrapper(SR)
        # 16-bit stdin streams raw int16 (passthrough); the partial
        # trailing byte is still dropped with the warning.
        assert w.output_dtype == np.int16
        out = np.frombuffer(w.read(1 << 20), dtype=np.int16)
        np.testing.assert_allclose(out, [100, -200])
        assert w.read(1 << 20) == b""
        assert "truncated mid-sample" in capsys.readouterr().err

    def test_fuzz_random_bytes_raise_only_valueerror(self):
        """Hostile/garbage input to the header walker must surface as the
        parser's ValueError contract, never an unhandled struct/index
        error — the serve loop turns these into protocol error events."""
        rng = np.random.default_rng(31)
        for _ in range(300):
            n = int(rng.integers(0, 64))
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                self._validate(blob)
            except ValueError:
                pass
        # Mutations of a valid header: flip bytes one at a time.
        base = bytearray(build_wav_header())
        for pos in range(len(base)):
            mutated = bytearray(base)
            mutated[pos] ^= 0xFF
            try:
                self._validate(bytes(mutated))
            except ValueError:
                pass

    def test_truncated_before_fmt_rejected(self):
        import struct

        raw = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        with pytest.raises(ValueError, match="missing fmt"):
            self._validate(raw)

    def test_missing_data_chunk_rejected(self):
        import struct

        full = build_wav_header()
        with pytest.raises(ValueError, match="missing data|truncated"):
            self._validate(full[:-8])  # drop the data chunk header


class TestNoFfmpeg:
    def test_wav_patterns_work_without_ffmpeg(self, tmp_path, monkeypatch):
        monkeypatch.setattr(audio_io, "_ffmpeg_available", False)
        t = np.arange(SR) / SR
        p = tmp_path / "c.wav"
        write_wav(p, 0.5 * np.sin(2 * np.pi * 700 * t), SR)
        data = audio_io.load_wave_file(str(p), SR)
        assert len(data) == SR

    def test_non_wav_without_ffmpeg_raises(self, tmp_path, monkeypatch):
        monkeypatch.setattr(audio_io, "_ffmpeg_available", False)
        p = tmp_path / "c.mp3"
        p.write_bytes(b"\xff\xfb" + b"\x00" * 100)
        with pytest.raises(ValueError, match="ffmpeg not available"):
            audio_io.load_wave_file(str(p), SR)
