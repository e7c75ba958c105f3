"""Bank sharding (model/TP analogue): sharded results == unsharded."""

import jax
import numpy as np
import pytest

from audio_pattern_detector_tpu.models.detector import (
    MARKER_TONE_STRATEGY,
    AudioPatternDetector,
)
from audio_pattern_detector_tpu.parallel import BankShardedBank, make_mesh
from audio_pattern_detector_tpu.utils.clip import AudioClip

SR = 8000

# Full-lane suite (pyproject addopts -m 'not slow'); run with pytest -m "".
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
]


def build_bank():
    rng = np.random.default_rng(0)
    clips = [
        AudioClip(
            name=f"n{i}",
            audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
            sample_rate=SR,
        )
        for i in range(8)
    ]
    m = SR // 4
    t = np.arange(m) / SR
    for i in range(8):
        f = 900.0 + 13 * i
        clips.append(
            AudioClip(
                name=f"m{i}",
                audio=np.sin(2 * np.pi * f * t).astype(np.float32),
                sample_rate=SR,
                strategy=MARKER_TONE_STRATEGY,
                strategy_params={"dominant_frequency_hz": f},
            )
        )
    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=10)
    return det._ensure_bank(), clips


class TestBankSharded:
    def test_matches_unsharded(self):
        bank, clips = build_bank()
        rng = np.random.default_rng(1)
        audio = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        audio[3 * SR : 4 * SR] += clips[2].audio
        audio[6 * SR : 6 * SR + len(clips[11].audio)] += 0.7 * clips[11].audio

        ref = bank.process_chunk(audio, None)
        sharded = BankShardedBank(bank, make_mesh({"bank": 8}))
        got = sharded.process_chunk(audio, None)
        assert got == ref
        assert ref["n2"] and ref["m3"]  # sanity: embedded clips found

    def test_second_chunk_lookback(self):
        bank, clips = build_bank()
        rng = np.random.default_rng(2)
        c0 = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        c1 = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        c1[2 * SR : 3 * SR] += clips[5].audio
        sharded = BankShardedBank(bank, make_mesh({"bank": 8}))
        ref = bank.process_chunk(c1, c0)
        got = sharded.process_chunk(c1, c0)
        assert got == ref

    def test_indivisible_group_auto_pads(self):
        """8-clip groups over 3 shards: padded to 9 with duplicate rows,
        results identical to the unsharded bank."""
        bank, clips = build_bank()
        rng = np.random.default_rng(3)
        audio = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        audio[3 * SR : 4 * SR] += clips[7].audio
        sharded = BankShardedBank(bank, make_mesh({"bank": 3}))
        ref = bank.process_chunk(audio, None)
        got = sharded.process_chunk(audio, None)
        assert got == ref
        assert ref["n7"]

    def test_dispatch_collect_async_pair(self):
        """dispatch/collect split: two chunks in flight produce the same
        results as synchronous processing."""
        bank, clips = build_bank()
        rng = np.random.default_rng(4)
        c0 = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        c1 = (0.01 * rng.standard_normal(10 * SR)).astype(np.float32)
        c0[2 * SR : 3 * SR] += clips[1].audio
        c1[5 * SR : 5 * SR + len(clips[9].audio)] += 0.8 * clips[9].audio
        sharded = BankShardedBank(bank, make_mesh({"bank": 8}))
        d0 = sharded.dispatch_chunk(c0, None)
        d1 = sharded.dispatch_chunk(c1, c0)  # in flight behind d0
        assert sharded.collect_chunk(d0) == bank.process_chunk(c0, None)
        assert sharded.collect_chunk(d1) == bank.process_chunk(c1, c0)
