"""Dev probe: run every pattern against every corpus audio (CPU) and print
the detection counts, to decide which pairs the corpus-wide FP matrix test
can pin as zero. Not part of the test suite."""

import glob
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from audio_pattern_detector_tpu.match import match_pattern  # noqa: E402

SA = os.path.join(os.path.dirname(__file__), "..", "..", "sample_audios")

patterns = sorted(
    glob.glob(os.path.join(SA, "clips", "*.wav"))
    + glob.glob(os.path.join(SA, "clips", "*.apd.toml"))
)
audios = sorted(
    glob.glob(os.path.join(SA, "*.wav"))
    + glob.glob(os.path.join(SA, "regressions", "*", "*.wav"))
)

for audio in audios:
    # One run with the full bank of patterns (mixed-results style).
    peaks, _ = match_pattern(audio, patterns)
    rel = os.path.relpath(audio, SA)
    counts = {k: len(v) for k, v in peaks.items() if v}
    print(f"{rel}: {counts or '{}'}", flush=True)
