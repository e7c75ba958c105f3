"""Packed int16-pair section upload: losslessness and engine equivalence."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from audio_pattern_detector_tpu.ops.packing import (
    PCM_SCALE,
    try_pack_pcm16,
    unpack_pcm16,
)

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

SR = 8000


class TestPackUnpack:
    def test_roundtrip_bit_exact(self):
        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32768, size=4096).astype(np.int16)
        section = (pcm.astype(np.float32)) / np.float32(PCM_SCALE)
        packed = try_pack_pcm16(section)
        assert packed is not None
        assert packed.shape == (2048,)
        out = np.asarray(unpack_pcm16(jnp.asarray(packed)))
        np.testing.assert_array_equal(out, section)

    def test_extremes_and_zeros(self):
        section = np.array(
            [-1.0, 32767 / 32768, 0.0, -0.0, 1 / 32768, -1 / 32768],
            dtype=np.float32,
        )
        packed = try_pack_pcm16(section)
        assert packed is not None
        out = np.asarray(unpack_pcm16(jnp.asarray(packed)))
        np.testing.assert_array_equal(out, section)

    @pytest.mark.parametrize(
        "bad",
        [
            np.array([0.5, 1.0], dtype=np.float32),  # +1.0 = 32768: no int16
            np.array([0.1, 0.25 + 1e-6], dtype=np.float32),  # not on grid
            np.array([0.0, 0.5, 0.25], dtype=np.float32),  # odd length
            np.array([0.0, np.float32(np.pi) / 4], dtype=np.float32),
        ],
    )
    def test_refuses_lossy(self, bad):
        assert try_pack_pcm16(bad) is None

    def test_negative_zero_canonicalises(self):
        """-0.0 (routine in np.round-quantised host audio) packs and
        unpacks as +0.0 — the one documented bit difference; values are
        equal and every engine consumer erases zero signs (abs/squares)
        before anything sign-sensitive, so results are unchanged."""
        sec = np.array([0.5, -0.0], dtype=np.float32)
        assert np.signbit(sec[1])
        packed = try_pack_pcm16(sec)
        assert packed is not None
        out = np.asarray(unpack_pcm16(jnp.asarray(packed)))
        np.testing.assert_array_equal(out, sec)  # value-equal (±0.0 ==)
        assert not np.signbit(out[1])  # canonicalised

    def test_refuses_resampled_noise(self):
        rng = np.random.default_rng(1)
        assert try_pack_pcm16(rng.standard_normal(512).astype(np.float32) * 0.1) is None


class TestEngineEquivalence:
    def _detect(self, audio, clip, monkeypatch, packed: bool):
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

        monkeypatch.setenv("APD_PACKED_UPLOAD", "1" if packed else "0")
        det = AudioPatternDetector(
            [AudioClip(name="c", audio=clip, sample_rate=SR)],
            seconds_per_chunk=10,
        )
        stream = AudioStream(
            name="s", audio_stream=io.BytesIO(audio.tobytes()), sample_rate=SR
        )
        results, total = det.find_clip_in_audio(stream)
        return results, total

    def test_packed_equals_unpacked_16bit_source(self, monkeypatch):
        rng = np.random.default_rng(2)
        t = np.arange(int(0.6 * SR)) / SR
        clip = (0.5 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float32)
        # 16-bit-PCM-exact audio: quantise the synthetic mix like a WAV.
        audio = 0.01 * rng.standard_normal(25 * SR)
        audio[5 * SR : 5 * SR + len(clip)] += clip
        audio[18 * SR : 18 * SR + len(clip)] += clip
        audio = (
            np.clip(np.round(audio * PCM_SCALE), -32768, 32767) / PCM_SCALE
        ).astype(np.float32)
        assert try_pack_pcm16(audio[: 2 * SR]) is not None

        r_packed, t_packed = self._detect(audio, clip, monkeypatch, True)
        r_plain, t_plain = self._detect(audio, clip, monkeypatch, False)
        assert t_packed == t_plain
        assert r_packed == r_plain
        assert r_packed is not None
        assert any(abs(x - 5.0) < 0.05 for x in r_packed["c"])
        assert any(abs(x - 18.0) < 0.05 for x in r_packed["c"])

    @pytest.mark.parametrize("mode", ["vmap", "scan"])
    def test_batched_packed_equals_unpacked(self, monkeypatch, mode):
        """The batch programs (offline scan / stream-batch / multi-stream)
        also take the packed upload; results must be identical to the f32
        path for PCM-exact audio."""
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip

        rng = np.random.default_rng(5)
        t = np.arange(int(0.6 * SR)) / SR
        clip = (0.5 * np.sin(2 * np.pi * 650.0 * t)).astype(np.float32)
        audio = 0.01 * rng.standard_normal(40 * SR)
        audio[7 * SR : 7 * SR + len(clip)] += clip
        audio[31 * SR : 31 * SR + len(clip)] += clip
        audio = (
            np.clip(np.round(audio * PCM_SCALE), -32768, 32767) / PCM_SCALE
        ).astype(np.float32)

        def run(packed: bool):
            monkeypatch.setenv("APD_PACKED_UPLOAD", "1" if packed else "0")
            det = AudioPatternDetector(
                [AudioClip(name="c", audio=clip, sample_rate=SR)],
                seconds_per_chunk=10,
            )
            return det.find_clip_in_array(
                audio, batch_size=2, batch_mode=mode
            )

        r_packed = run(True)
        r_plain = run(False)
        assert r_packed == r_plain
        assert any(abs(x - 7.0) < 0.05 for x in r_packed[0]["c"])
        assert any(abs(x - 31.0) < 0.05 for x in r_packed[0]["c"])

    def test_float_source_falls_back_and_detects(self, monkeypatch):
        rng = np.random.default_rng(3)
        t = np.arange(int(0.6 * SR)) / SR
        clip = (0.5 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float32)
        audio = (0.01 * rng.standard_normal(25 * SR)).astype(np.float32)
        audio[5 * SR : 5 * SR + len(clip)] += clip
        assert try_pack_pcm16(audio[: 2 * SR]) is None  # not PCM-exact

        r_packed, _ = self._detect(audio, clip, monkeypatch, True)
        r_plain, _ = self._detect(audio, clip, monkeypatch, False)
        assert r_packed == r_plain
        assert r_packed is not None and len(r_packed["c"]) >= 1


class TestRoundtripProbe:
    """packed_upload_supported: the one-per-process NaN-payload sentinel
    round-trip that guards packing against transfer layers which
    canonicalise NaN bit patterns (would silently corrupt near-full-scale
    odd-index samples)."""

    def test_supported_on_this_backend(self):
        from audio_pattern_detector_tpu.ops import packing

        assert packing.packed_upload_supported() is True
        # Cached: second call must not re-probe (observable as stability).
        assert packing.packed_upload_supported() is True

    def test_bank_disables_packing_when_probe_fails(self, monkeypatch):
        from audio_pattern_detector_tpu.models.bank import PatternBank
        from audio_pattern_detector_tpu.ops import packing
        import audio_pattern_detector_tpu.models.bank as bank_mod

        monkeypatch.setattr(
            bank_mod, "packed_upload_supported", lambda: False
        )
        rng = np.random.default_rng(0)
        clip = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector

        det = AudioPatternDetector(
            audio_clips=[AudioClip(name="c", audio=clip, sample_rate=SR)],
            seconds_per_chunk=20,
        )
        assert det._ensure_bank()._packed_upload is False

    def test_probe_detects_canonicalising_backend(self, monkeypatch):
        """If the device unpack returns canonicalised samples, the probe
        must report unsupported (fresh cache per monkeypatched run)."""
        from audio_pattern_detector_tpu.ops import packing

        def corrupting_unpack(packed):
            out = unpack_pcm16(packed)
            # Simulate NaN canonicalisation: quiet every odd sample whose
            # int16 pattern lies in the NaN-payload range.
            q = jnp.round(out * PCM_SCALE).astype(jnp.int32)
            odd = jnp.arange(out.shape[0]) % 2 == 1
            hazard = odd & (((q & 0x7F80) == 0x7F80) | (q >= 32640))
            return jnp.where(hazard, 0.0, out)

        monkeypatch.setattr(packing, "_ROUNDTRIP_OK", None)
        monkeypatch.setattr(packing, "unpack_pcm16", corrupting_unpack)
        assert packing.packed_upload_supported() is False
