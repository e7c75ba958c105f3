"""Real-broadcast regression corpus — the acceptance suite.

Exact match counts and timestamps within ±0.02 s on real captures; false
positive fixtures must yield zero detections
(reference: tests/test_real_data_regressions.py — same fixtures, same
expectations, rebuilt runner).
"""

import os

import pytest

from tests.conftest import SAMPLE_AUDIOS
from audio_pattern_detector_tpu.match import match_pattern

RTHK = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")
R903 = os.path.join(SAMPLE_AUDIOS, "clips", "903_beep.apd.toml")
R881 = os.path.join(SAMPLE_AUDIOS, "clips", "881_beep.apd.toml")
REG = os.path.join(SAMPLE_AUDIOS, "regressions")

STRAY_V2 = os.path.join(REG, "rthk_beep_stray_clips_v2")
LEADINS = os.path.join(REG, "rthk_beep_hourly_leadins")
OPENINGS = os.path.join(REG, "rthk_beep_hourly_openings")
R903_DIR = os.path.join(REG, "903_beep_openings")
R881_DIR = os.path.join(REG, "881_beep_openings")

# The 0.02 s tolerance: the synthesised sine pattern's correlation peak can
# land a phase-aligned cycle away from the true beep start.
TOL = 0.02

CASES = [
    (RTHK, f"{STRAY_V2}/tp_09-10_beep1.wav", [2.00525, 3.004875]),
    (RTHK, f"{STRAY_V2}/tp_09-10_beep2.wav", [1.01525, 2.014875, 3.015]),
    (RTHK, f"{STRAY_V2}/tp_09-10_beep3.wav", [0.01525, 1.014875, 2.015, 3.01225]),
    (RTHK, f"{STRAY_V2}/v2_10-11_20m21s.wav", []),
    (RTHK, f"{STRAY_V2}/v2_10-11_50m40s.wav", []),
    (RTHK, f"{STRAY_V2}/v2_20-21_35m13s.wav", []),
    (RTHK, f"{STRAY_V2}/v2_22-23_19m48s.wav", []),
    (
        RTHK,
        f"{LEADINS}/radio1_2026-04-06_12_to_13_28m51_leadin.wav",
        [1.0085, 2.0, 3.013125, 3.987875, 5.025125],
    ),
    (
        RTHK,
        f"{LEADINS}/radio1_2026-04-06_17_to_18_59m01_leadin.wav",
        [0.014125, 1.02625, 2.01, 3.015375, 4.017875],
    ),
    (
        RTHK,
        f"{OPENINGS}/radio1_2026-04-06_12_to_13_28m49_opening.wav",
        [1.02325, 2.0335, 3.025, 4.038125, 5.012875, 6.050125],
    ),
    (
        RTHK,
        f"{OPENINGS}/radio1_2026-04-06_17_to_18_58m58_opening.wav",
        [1.06975, 2.068875, 3.090625, 4.074375, 5.07975, 6.08225],
    ),
    (R903, f"{R903_DIR}/radio903_2026-04-17_09_to_10_12s_opening.wav", [12.163125]),
    (R903, f"{R903_DIR}/radio903_2026-04-17_15_to_16_opening.wav", [11.26425]),
    (R903, f"{R903_DIR}/radio903_2026-04-17_06_to_07_no_opening_beep.wav", []),
    (R881, f"{R881_DIR}/radio881_2026-04-16_10_to_11_10s_opening.wav", [10.78125]),
    (R881, f"{R881_DIR}/radio881_2026-04-15_11_to_12_30m20s_opening.wav", [10.25875]),
    (R881, f"{R903_DIR}/radio903_2026-04-17_06_to_07_no_opening_beep.wav", []),
]


@pytest.mark.parametrize(
    "pattern,audio,expected",
    CASES,
    ids=[os.path.basename(c[1]) + "/" + os.path.basename(c[0]) for c in CASES],
)
def test_regression_case(pattern, audio, expected):
    peaks, _ = match_pattern(audio, [pattern])
    got = sorted(t for ts in peaks.values() for t in ts)
    assert len(got) == len(expected), (
        f"Expected {len(expected)} matches, found {len(got)}: {got}"
    )
    for g, e in zip(got, sorted(expected)):
        assert abs(g - e) < TOL, f"Expected timestamp ~{e}s, got {g}s"
