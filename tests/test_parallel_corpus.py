"""Golden corpus through the sharded detector: serial-identical timestamps.

VERDICT r1 #3/#5 acceptance: the real rthk/cbs/am1430 fixtures run through
ShardedDetector on the virtual 8-device mesh — time-only, stream × time,
and bank × time meshes — and must produce timestamps identical to the
serial engine at the same chunk size (serial contract: reference
audio_pattern_detector.py:400-452). The rthk marker comb also exercises
the sharded path's full-tier device rerun (flag-2 cells).
"""

import io
import os

import jax
import numpy as np
import pytest

from tests.conftest import SAMPLE_AUDIOS
from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream
from audio_pattern_detector_tpu.parallel import (
    ShardedDetector,
    detections_from_sharded,
    make_mesh,
)
from audio_pattern_detector_tpu.utils.audio_io import load_wave_file

SR = 8000

# Full-lane suite (pyproject addopts -m 'not slow'); run with pytest -m "".
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
]


def corpus(rel):
    return os.path.join(SAMPLE_AUDIOS, rel)


@pytest.fixture(scope="module")
def corpus_clips():
    return [
        AudioClip.from_audio_file(corpus("clips/rthk_beep.apd.toml"), SR),
        AudioClip.from_audio_file(corpus("clips/cbs_news.wav"), SR),
        AudioClip.from_audio_file(corpus("clips/天空下的彩虹intro.wav"), SR),
    ]


@pytest.fixture(scope="module")
def corpus_audios():
    return {
        "rthk": load_wave_file(corpus("rthk_section_with_beep.wav"), SR),
        "cbs": load_wave_file(corpus("cbs_news_audio_section.wav"), SR),
        "am1430": load_wave_file(
            corpus("am1430_section_with_rainbow_intro.wav"), SR
        ),
    }


CHUNK_S = 8  # >= 2 * max sliding window (rainbow intro: 4 s)


def serial_results(clips, audio, chunk_s=CHUNK_S):
    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=chunk_s)
    stream = AudioStream(
        name="s",
        audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )
    res, _ = det.find_clip_in_audio(stream)
    return {k: sorted(v) for k, v in res.items()}


MESHES = [
    pytest.param({"time": 8}, id="time8"),
    pytest.param({"stream": 2, "time": 4}, id="stream2-time4"),
    pytest.param({"bank": 2, "time": 4}, id="bank2-time4"),
]


class TestCorpusSerialIdentity:
    @pytest.mark.parametrize("mesh_shape", MESHES)
    @pytest.mark.parametrize("which", ["rthk", "cbs", "am1430"])
    def test_section(self, mesh_shape, which, corpus_clips, corpus_audios):
        audio = corpus_audios[which]
        serial = serial_results(corpus_clips, audio)
        # Expected hits exist (golden baseline, BASELINE.md).
        if which == "rthk":
            assert len(serial["rthk_beep"]) == 2
        elif which == "cbs":
            assert len(serial["cbs_news"]) == 1
        else:
            assert len(serial["天空下的彩虹intro"]) == 1

        sd = ShardedDetector(
            corpus_clips,
            make_mesh(mesh_shape),
            chunk_seconds=CHUNK_S,
        )
        B = mesh_shape.get("stream", 1)
        batch = np.tile(audio[None, :], (B, 1))
        sharded = sd.detect(batch)
        for b in range(B):
            got = {
                k: sorted(v)
                for k, v in detections_from_sharded(sharded, b).items()
            }
            assert got == serial, f"mesh {mesh_shape} stream {b} diverged"


class TestRegressionFixtures:
    """Real-broadcast regression captures through the sharded engine."""

    CASES = [
        (
            "clips/903_beep.apd.toml",
            "regressions/903_beep_openings/radio903_2026-04-17_09_to_10_12s_opening.wav",
            1,
        ),
        (
            "clips/903_beep.apd.toml",
            "regressions/903_beep_openings/radio903_2026-04-17_06_to_07_no_opening_beep.wav",
            0,
        ),
        (
            "clips/rthk_beep.apd.toml",
            "regressions/rthk_beep_stray_clips_v2/tp_09-10_beep1.wav",
            None,  # count taken from the serial run
        ),
    ]

    @pytest.mark.parametrize(
        "clip_rel,audio_rel,expected", CASES,
        ids=["903-tp", "903-fp", "rthk-stray"],
    )
    def test_fixture(self, clip_rel, audio_rel, expected):
        clip = AudioClip.from_audio_file(corpus(clip_rel), SR)
        audio = load_wave_file(corpus(audio_rel), SR)
        serial = serial_results([clip], audio, chunk_s=2)
        if expected is not None:
            assert len(serial[clip.name]) == expected

        sd = ShardedDetector(
            [clip], make_mesh({"time": 8}), chunk_seconds=2
        )
        got = detections_from_sharded(sd.detect(audio[None, :]), 0)
        assert {clip.name: sorted(got[clip.name])} == serial


class TestShardedFullTierRerun:
    def test_dense_cell_takes_device_rerun(self, monkeypatch):
        """A candidate-dense device cell (>16 raw candidates, fits
        k_detect) flags 2; the sharded session must resolve it through the
        full-tier DEVICE rerun — never the host path — and stay
        serial-identical."""
        rng = np.random.default_rng(11)
        clip = AudioClip(
            name="c",
            audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
            sample_rate=SR,
        )
        chunk_s = 20
        audio = (0.004 * rng.standard_normal(4 * chunk_s * SR)).astype(
            np.float32
        )
        # 18 copies inside device 1's chunk → small tier overflows there.
        for k in range(18):
            o = int((chunk_s + 0.3 + 1.05 * k) * SR)
            audio[o : o + SR] += clip.audio
        # One ordinary hit on device 3.
        o = int((3 * chunk_s + 5.0) * SR)
        audio[o : o + SR] += clip.audio

        sd = ShardedDetector([clip], make_mesh({"time": 4}), chunk_seconds=chunk_s)
        host_calls: list[int] = []
        orig_host = sd.bank._host_fallback
        monkeypatch.setattr(
            sd.bank,
            "_host_fallback",
            lambda *a, **k: host_calls.append(1) or orig_host(*a, **k),
        )
        rerun_calls: list[int] = []
        orig_row = sd.bank._full_tier_row
        monkeypatch.setattr(
            sd.bank,
            "_full_tier_row",
            lambda *a, **k: rerun_calls.append(1) or orig_row(*a, **k),
        )
        orig_cls = sd.bank._full_tier_packed
        monkeypatch.setattr(
            sd.bank,
            "_full_tier_packed",
            lambda *a, **k: rerun_calls.append(1) or orig_cls(*a, **k),
        )

        got = detections_from_sharded(sd.detect(audio[None, :]), 0)
        serial = serial_results([clip], audio, chunk_s=chunk_s)
        assert sorted(got["c"]) == serial["c"]
        assert len(got["c"]) >= 19
        assert rerun_calls, "expected at least one full-tier device rerun"
        assert not host_calls, "dense cell should not hit the host path"
        assert rerun_calls, "expected at least one full-tier device rerun"
        assert not host_calls, "marker comb should not hit the host path"
