"""Candidate-capacity overflow reroutes to the exact host path.

Adversarial inputs (dense oscillations above the height threshold) can
exceed the device program's static candidate tier; the overflow flag must
trigger the host fallback and produce exactly the host-model results.
"""

import io

import numpy as np

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream
from audio_pattern_detector_tpu.models import hostpath

SR = 8000


def test_overflow_triggers_exact_host_fallback(monkeypatch):
    rng = np.random.default_rng(0)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    bank = det._ensure_bank()

    # Shrink the candidate tier so ordinary noise overflows it.
    g = bank.classes[1]["groups"][0]
    g.k_detect = 8
    g.k_verify = 4
    bank._metas[1] = (("normal", g.clip_len, 8, 4),)

    # Many repetitions -> more raw correlation peaks than the shrunken tier.
    audio = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
    for k in range(12):
        o = int((0.2 + 0.75 * k) * SR)
        audio[o : o + SR] += clip.audio[: min(SR, 10 * SR - o)]

    calls = []
    original = hostpath.process_section_host

    def spy(*args, **kwargs):
        calls.append(1)
        return original(*args, **kwargs)

    monkeypatch.setattr(hostpath, "process_section_host", spy)

    got = bank.process_chunk(audio, None)
    assert calls, "overflow did not reroute to the host path"

    want = original(
        audio_section=audio,
        clip=g.clips_np[0],
        correlation_clip=g.corr_clips_np[0],
        correlation_clip_absolute_max=float(g.self_max_np[0]),
        sr=SR,
        height_min=0.25,
        is_short_clip=False,
        tone_frequency=None,
        verification_params={},
    )
    assert got["c"] == want
