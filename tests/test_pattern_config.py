"""`.apd.toml` schema acceptance/rejection matrix.

Mirrors the reference config tests (reference: tests/test_pattern_config.py).
"""

import base64
import io
import wave

import numpy as np
import pytest

from audio_pattern_detector_tpu.utils.clip import AudioClip
from audio_pattern_detector_tpu.utils.pattern_config import load_apd_file

SR = 8000


def write_apd(tmp_path, text, name="pat.apd.toml"):
    p = tmp_path / name
    p.write_text(text)
    return p


def make_wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        pcm = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


SINE_DOC = """
description = "test"
[clip]
source = "sine"
frequency_hz = 1000.0
duration_seconds = 0.25
amplitude = 1.0
[verification]
strategy = "marker_tone"
"""


class TestSineSource:
    def test_basic_load(self, tmp_path):
        cfg = load_apd_file(write_apd(tmp_path, SINE_DOC), sample_rate=SR)
        assert cfg.strategy == "marker_tone"
        assert len(cfg.audio) == round(0.25 * SR)
        assert cfg.strategy_params["dominant_frequency_hz"] == 1000.0
        # Synthesised sine round-trips at declared frequency/amplitude.
        spec = np.abs(np.fft.rfft(cfg.audio))
        freqs = np.fft.rfftfreq(len(cfg.audio), 1 / SR)
        assert abs(freqs[np.argmax(spec)] - 1000.0) < 10
        assert np.max(np.abs(cfg.audio)) <= 1.0

    def test_sine_respects_target_rate(self, tmp_path):
        cfg = load_apd_file(write_apd(tmp_path, SINE_DOC), sample_rate=16000)
        assert len(cfg.audio) == round(0.25 * 16000)

    def test_nyquist_rejected(self, tmp_path):
        doc = SINE_DOC.replace("frequency_hz = 1000.0", "frequency_hz = 4000.0")
        with pytest.raises(ValueError, match="Nyquist"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_negative_duration_rejected(self, tmp_path):
        doc = SINE_DOC.replace("duration_seconds = 0.25", "duration_seconds = -1")
        with pytest.raises(ValueError, match="duration_seconds"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_missing_frequency_rejected(self, tmp_path):
        doc = SINE_DOC.replace("frequency_hz = 1000.0\n", "")
        with pytest.raises(ValueError, match="frequency_hz"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_boolean_for_numeric_field_rejected(self, tmp_path):
        """bool is an int subclass; `frequency_hz = true` must not pass
        the numeric check and synthesise a 1 Hz "tone" silently."""
        doc = SINE_DOC.replace("frequency_hz = 1000.0", "frequency_hz = true")
        with pytest.raises(ValueError, match="frequency_hz.*got bool"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)
        doc = SINE_DOC.replace("amplitude = 1.0", "amplitude = false")
        with pytest.raises(ValueError, match="amplitude.*got bool"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_clip_field_rejected(self, tmp_path):
        doc = SINE_DOC.replace("[verification]", "bogus = 1\n[verification]")
        with pytest.raises(ValueError, match="unknown"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_explicit_dominant_frequency_wins(self, tmp_path):
        doc = SINE_DOC.replace(
            'strategy = "marker_tone"',
            'strategy = "marker_tone"\ndominant_frequency_hz = 999.5',
        )
        cfg = load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)
        assert cfg.strategy_params["dominant_frequency_hz"] == 999.5


class TestWavBase64Source:
    def _doc(self, b64):
        return f"""
[clip]
source = "wav_base64"
data = \"\"\"
{b64}
\"\"\"
[verification]
strategy = "marker_tone"
dominant_frequency_hz = 700.0
"""

    def test_roundtrip_with_multiline_base64(self, tmp_path):
        t = np.arange(int(0.2 * SR)) / SR
        tone = 0.5 * np.sin(2 * np.pi * 700 * t)
        raw = base64.b64encode(make_wav_bytes(tone, SR)).decode()
        wrapped = "\n".join(raw[i : i + 60] for i in range(0, len(raw), 60))
        cfg = load_apd_file(write_apd(tmp_path, self._doc(wrapped)), sample_rate=SR)
        assert len(cfg.audio) == int(0.2 * SR)
        spec = np.abs(np.fft.rfft(cfg.audio))
        freqs = np.fft.rfftfreq(len(cfg.audio), 1 / SR)
        assert abs(freqs[np.argmax(spec)] - 700.0) < 10

    def test_resamples_to_target(self, tmp_path):
        t = np.arange(int(0.2 * 16000)) / 16000
        tone = 0.5 * np.sin(2 * np.pi * 700 * t)
        raw = base64.b64encode(make_wav_bytes(tone, 16000)).decode()
        cfg = load_apd_file(write_apd(tmp_path, self._doc(raw)), sample_rate=SR)
        assert len(cfg.audio) == int(0.2 * SR)

    def test_invalid_base64_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="base64"):
            load_apd_file(write_apd(tmp_path, self._doc("!!notbase64!!")), sample_rate=SR)


class TestSchemaRejections:
    def test_legacy_generator_section_rejected(self, tmp_path):
        """The pre-apd `[generator]` layout is versioned out by unknown-field
        rejection (reference: tests/test_pattern_config.py:193-205)."""
        doc = """
[generator]
type = "sine"
frequency_hz = 1000.0
[verification]
strategy = "marker_tone"
"""
        with pytest.raises(ValueError):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_clip_source_rejected(self, tmp_path):
        doc = """
[clip]
source = "white_noise"
[verification]
strategy = "marker_tone"
"""
        with pytest.raises(ValueError, match="unknown .clip..source"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_missing_clip_section_rejected(self, tmp_path):
        doc = """
[verification]
strategy = "marker_tone"
"""
        with pytest.raises(ValueError, match="clip"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_wav_base64_field_rejected(self, tmp_path):
        doc = """
[clip]
source = "wav_base64"
data = "AAAA"
frequency_hz = 700.0
[verification]
strategy = "marker_tone"
"""
        with pytest.raises(ValueError, match="frequency_hz"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_top_level(self, tmp_path):
        doc = "strategy = 'marker_tone'\n" + SINE_DOC
        with pytest.raises(ValueError, match="unknown top-level"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_strategy(self, tmp_path):
        doc = SINE_DOC.replace('"marker_tone"', '"bogus"')
        with pytest.raises(ValueError, match="unknown strategy"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_unknown_verification_field(self, tmp_path):
        doc = SINE_DOC + "\n"
        doc = doc.replace('strategy = "marker_tone"', 'strategy = "marker_tone"\nnope = 3')
        with pytest.raises(ValueError, match="unknown \\[verification\\]"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_missing_verification_section(self, tmp_path):
        doc = SINE_DOC.split("[verification]")[0]
        with pytest.raises(ValueError, match="verification"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_invalid_toml(self, tmp_path):
        with pytest.raises(ValueError, match="invalid TOML"):
            load_apd_file(write_apd(tmp_path, "not [valid toml"), sample_rate=SR)

    def test_threshold_types_enforced(self, tmp_path):
        doc = SINE_DOC.replace(
            'strategy = "marker_tone"',
            'strategy = "marker_tone"\nminimum_longest_active_run = 1.5',
        )
        with pytest.raises(ValueError, match="minimum_longest_active_run"):
            load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)

    def test_thresholds_parsed(self, tmp_path):
        doc = SINE_DOC.replace(
            'strategy = "marker_tone"',
            'strategy = "marker_tone"\nminimum_band_purity = 0.7\nminimum_longest_active_run = 5',
        )
        cfg = load_apd_file(write_apd(tmp_path, doc), sample_rate=SR)
        assert cfg.strategy_params["verification"] == {
            "minimum_band_purity": 0.7,
            "minimum_longest_active_run": 5,
        }


class TestAudioClipDispatch:
    def test_apd_extension_dispatch(self, tmp_path):
        p = write_apd(tmp_path, SINE_DOC, name="mybeep.apd.toml")
        clip = AudioClip.from_audio_file(p)
        assert clip.name == "mybeep"
        assert clip.strategy == "marker_tone"

    def test_wav_dispatch(self, tmp_path):
        t = np.arange(SR) / SR
        tone = 0.5 * np.sin(2 * np.pi * 700 * t)
        p = tmp_path / "plain.wav"
        p.write_bytes(make_wav_bytes(tone, SR))
        clip = AudioClip.from_audio_file(str(p))
        assert clip.name == "plain"
        assert clip.strategy is None
        assert len(clip.audio) == SR
