"""Two-tier verification: the streaming program verifies a 16-lane small
tier when every row's live candidates fit, and falls back to the full
k_verify tier otherwise (lax.cond in models/bank.py). Both branches must be
exact against the host model."""

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector
from audio_pattern_detector_tpu.models import hostpath

SR = 8000


def _host(bank, g, ci, section):
    return hostpath.process_section_host(
        audio_section=section,
        clip=g.clips_np[ci],
        correlation_clip=g.corr_clips_np[ci],
        correlation_clip_absolute_max=float(g.self_max_np[ci]),
        sr=SR,
        height_min=0.25,
        is_short_clip=g.clip_len / SR < 0.5,
        tone_frequency=g.tone_freqs[ci],
        verification_params=g.verification_params[ci],
    )


@pytest.mark.parametrize("n_embeds", [3, 24])  # small tier vs full tier
def test_tier_paths_match_host(n_embeds):
    rng = np.random.default_rng(1)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=60)
    bank = det._ensure_bank()
    g = bank.classes[1]["groups"][0]
    assert g.k_verify > 16, "test assumes a full tier larger than the small tier"

    audio = (0.01 * rng.standard_normal(60 * SR)).astype(np.float32)
    for i in range(n_embeds):
        o = int((0.5 + 2.4 * i) * SR)
        audio[o : o + SR] += clip.audio

    got = bank.process_chunk(audio, None)
    want = _host(bank, g, 0, audio)
    assert got["c"] == want
    assert len(got["c"]) == n_embeds
