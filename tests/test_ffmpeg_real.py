"""REAL-ffmpeg lane: the subprocess decode paths, actually executed.

Monkeypatched coverage of the ffmpeg wrappers lives in
tests/test_audio_utils.py / test_utils_misc.py; this file runs the real
binaries (decode pipe pacing, resample flags, nonzero-exit surfaces, an
end-to-end lossy-codec match) — the runtime behaviour the reference's
CI exercises via its Docker image (reference:
audio_utils.py:239-352, Dockerfile.test).

The bench/build image has no ffmpeg (zero egress, nothing installable),
so these SKIP there — but the CI image (Dockerfile.test) installs
ffmpeg and sets ``APD_REQUIRE_FFMPEG=1``, which turns a skip into a
FAILURE: the ffmpeg lane provably runs somewhere
(docs/reference-parity.md records which environment verifies what).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from tests.conftest import SAMPLE_AUDIOS
from audio_pattern_detector_tpu.utils.audio_io import (
    ffmpeg_get_float32_pcm,
    get_audio_duration,
    is_ffmpeg_available,
    load_wave_file,
)

# Full-lane suite: excluded from the default fast lane.
pytestmark = pytest.mark.slow

SR = 8000
RTHK = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")


def _require_ffmpeg() -> None:
    if not is_ffmpeg_available():
        if os.environ.get("APD_REQUIRE_FFMPEG"):
            pytest.fail(
                "APD_REQUIRE_FFMPEG is set but ffmpeg/ffprobe is not "
                "available — the real-ffmpeg lane must RUN in this "
                "environment (Dockerfile.test installs it)"
            )
        pytest.skip("ffmpeg/ffprobe unavailable (docs/reference-parity.md)")


def test_decode_matches_wave_reader():
    """Real ffmpeg decode of a 16-bit WAV equals the stdlib WAV reader
    (same samples, float32) — the reference's decode contract
    (reference: audio_utils.py:110-132)."""
    _require_ffmpeg()
    expected = load_wave_file(RTHK, SR)
    with ffmpeg_get_float32_pcm(RTHK, target_sample_rate=SR, ac=1) as pipe:
        raw = pipe.read()
    got = np.frombuffer(raw, dtype=np.float32)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_decode_resamples():
    """ffmpeg's -ar path delivers the requested rate (length scales with
    the duration)."""
    _require_ffmpeg()
    d = get_audio_duration(RTHK)
    assert d is not None
    with ffmpeg_get_float32_pcm(RTHK, target_sample_rate=16000, ac=1) as pipe:
        raw = pipe.read()
    n = len(raw) // 4
    assert abs(n - d * 16000) < 16000 * 0.05, (n, d)


def test_nonzero_exit_surfaces_as_value_error(tmp_path):
    """A garbage input makes the ffmpeg child exit nonzero; the wrapper
    must surface that as the reference's ValueError, not hang or
    silently truncate (reference: audio_utils.py:264-268)."""
    _require_ffmpeg()
    bad = tmp_path / "garbage.mp3"
    bad.write_bytes(b"\x00not audio at all\xff" * 64)
    with pytest.raises(ValueError, match="ffmpeg command failed"):
        with ffmpeg_get_float32_pcm(
            str(bad), target_sample_rate=SR, ac=1
        ) as pipe:
            pipe.read()


def test_lossy_codec_end_to_end_match(tmp_path):
    """Full product path on a REAL lossy source: transcode the golden
    marker-tone sample to Opus-in-OGG with real ffmpeg, run `match` on
    it (auto-decodes through the ffmpeg pipe), and expect the two beep
    detections within codec tolerance of the golden timestamps — the
    reference's own Opus-degradation scenario
    (reference: tests/test_audio_utils.py:274-307)."""
    _require_ffmpeg()
    ogg = str(tmp_path / "rthk.ogg")
    r = subprocess.run(
        ["ffmpeg", "-v", "error", "-y", "-i", RTHK, "-c:a", "libopus", ogg],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"this ffmpeg lacks libopus: {r.stderr[-200:]}")

    from audio_pattern_detector_tpu.match import match_pattern

    toml = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")
    results, _total = match_pattern(ogg, [toml], accumulate_results=True)
    assert results is not None
    times = sorted(results["rthk_beep"])
    assert len(times) == 2, results
    for got, want in zip(times, (1.408, 2.420)):
        assert abs(got - want) < 0.06, (times, want)
