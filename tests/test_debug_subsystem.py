"""Debug-mode observability: the artifact tree is the deep-debug system
(reference: audio_pattern_detector.py:177-202,333-370,498-581 — graphs,
candidate WAV dumps, JSON peak dumps under --debug-dir; SURVEY.md §5).

Runs the real corpus through debug_mode=True and asserts the artifacts and
that detections are unchanged. Graph PNGs are asserted only when matplotlib
imports (it is an optional dependency); WAV + JSON dumps are mandatory.
"""

import glob
import json
import os
import wave

import numpy as np
import pytest

from tests.conftest import SAMPLE_AUDIOS
from audio_pattern_detector_tpu.match import match_pattern
from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
from audio_pattern_detector_tpu.utils.clip import AudioClip

RTHK_AUDIO = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")
RTHK_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")
CBS_AUDIO = os.path.join(SAMPLE_AUDIOS, "cbs_news_audio_section.wav")
CBS_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "cbs_news.wav")


def _has_mpl() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except Exception:
        return False


class TestMarkerToneDebugArtifacts:
    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        debug_dir = str(tmp_path_factory.mktemp("debug_rthk"))
        peaks, total = match_pattern(
            RTHK_AUDIO, [RTHK_PATTERN], debug_mode=True, debug_dir=debug_dir
        )
        return debug_dir, peaks, total

    def test_detections_unchanged_in_debug_mode(self, run):
        _, peaks, total = run
        got = sorted(peaks["rthk_beep"])
        assert len(got) == 2
        assert abs(got[0] - 1.407375) < 0.01
        assert abs(got[1] - 2.419125) < 0.01
        assert 4.0 < total < 4.2

    def test_candidate_wav_dumps(self, run):
        debug_dir, _, _ = run
        wavs = glob.glob(f"{debug_dir}/audio_section/rthk_beep/*.wav")
        assert len(wavs) >= 2, f"expected candidate WAV dumps, got {wavs}"
        with wave.open(wavs[0], "rb") as w:
            assert w.getframerate() == 8000
            assert w.getnframes() > 0

    def test_peaks_json_dump(self, run):
        debug_dir, _, _ = run
        txts = glob.glob(f"{debug_dir}/debug/cross_correlation_rthk_beep/*.txt")
        assert len(txts) == 1, txts
        with open(txts[0]) as f:
            payload = json.load(f)
        assert set(payload) == {"peaks", "seconds", "similarities"}
        assert len(payload["peaks"]) >= 2  # the two beep candidates

    @pytest.mark.skipif(not _has_mpl(), reason="matplotlib unavailable")
    def test_graphs(self, run):
        debug_dir, _, _ = run
        assert os.path.exists(f"{debug_dir}/graph/clip_correlation/rthk_beep.png")
        assert os.path.exists(
            f"{debug_dir}/graph/cross_correlation_slice_original/rthk_beep/rthk_beep.png"
        )
        per_chunk = glob.glob(f"{debug_dir}/graph/cross_correlation/rthk_beep/*.png")
        assert len(per_chunk) == 1  # one 60 s chunk covers the 4 s section
        scatter = glob.glob(
            f"{debug_dir}/graph/mean_squared_error_similarity/rthk_beep/*.png"
        )
        assert len(scatter) == 1  # post-run scatter


class TestNormalPathDebugArtifacts:
    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        debug_dir = str(tmp_path_factory.mktemp("debug_cbs"))
        peaks, total = match_pattern(
            CBS_AUDIO, [CBS_PATTERN], debug_mode=True, debug_dir=debug_dir
        )
        return debug_dir, peaks, total

    def test_detections_unchanged(self, run):
        _, peaks, _ = run
        assert len(peaks["cbs_news"]) == 1
        assert abs(peaks["cbs_news"][0] - 25.89875) < 0.01

    def test_candidate_and_json_dumps(self, run):
        debug_dir, _, _ = run
        assert glob.glob(f"{debug_dir}/audio_section/cbs_news/*.wav")
        txts = glob.glob(f"{debug_dir}/debug/cross_correlation_cbs_news/*.txt")
        assert txts
        payload = json.load(open(txts[0]))
        # Normal path records per-candidate similarity detail.
        assert payload["similarities"], payload

    @pytest.mark.skipif(not _has_mpl(), reason="matplotlib unavailable")
    def test_pearson_window_graphs(self, run):
        debug_dir, _, _ = run
        # The accepted candidate passes the similarity gate, so its three
        # Pearson windows are graphed (reference: :848-895).
        windows = glob.glob(f"{debug_dir}/graph/pearson_downsampled/cbs_news/*.png")
        assert len(windows) >= 3, windows
        assert glob.glob(f"{debug_dir}/graph/cross_correlation_slice/cbs_news/*.png")


class TestDebugModeGating:
    def test_debug_disabled_for_nondefault_chunk(self):
        """Debug mode force-disables itself when seconds_per_chunk != 60
        (reference: audio_pattern_detector.py:141-143)."""
        rng = np.random.default_rng(0)
        clip = AudioClip(
            name="c",
            audio=(0.3 * rng.standard_normal(8000)).astype(np.float32),
            sample_rate=8000,
        )
        det = AudioPatternDetector(
            audio_clips=[clip], debug_mode=True, seconds_per_chunk=10
        )
        assert det.debug_mode is False

    def test_debug_enabled_for_default_chunk(self, tmp_path):
        rng = np.random.default_rng(0)
        clip = AudioClip(
            name="c",
            audio=(0.3 * rng.standard_normal(8000)).astype(np.float32),
            sample_rate=8000,
        )
        det = AudioPatternDetector(
            audio_clips=[clip],
            debug_mode=True,
            seconds_per_chunk=60,
            debug_dir=str(tmp_path),
        )
        assert det.debug_mode is True
