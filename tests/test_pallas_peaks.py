"""Pallas single-pass candidate scan vs the XLA formulation."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_pattern_detector_tpu.ops.pallas_peaks import (
    BLOCK,
    LPAD,
    NB,
    candidate_scan,
)
from audio_pattern_detector_tpu.ops.peaks import (
    long_plateau_present,
    short_run_local_maxima_mask,
)

SR = 8000


def _xla_reference(corr, thr_min, valid_len):
    """The quantities candidate_scan computes, via the XLA ops."""
    g, l = corr.shape
    idx = jnp.arange(l, dtype=jnp.int32)[None, :]
    x = jnp.where(idx < valid_len, jnp.asarray(corr), -jnp.inf)
    cand = short_run_local_maxima_mask(x)
    thr = jnp.asarray(thr_min)[:, None]
    count = jnp.sum(cand & (x >= thr), axis=1).astype(jnp.float32)
    plateau = long_plateau_present(x, thr)
    omax = jnp.max(jnp.where(jnp.isfinite(x), x, 0.0), axis=1)
    scored = jnp.where(cand, x, -jnp.inf)
    pad = NB * BLOCK - l
    scored = jnp.pad(scored, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    bmax = jnp.max(scored.reshape(g, NB, BLOCK), axis=2)
    return (
        np.asarray(bmax),
        np.asarray(count),
        np.asarray(plateau),
        np.asarray(omax),
    )


class TestCandidateScan:
    @pytest.mark.parametrize("seed,n_valid_off", [(0, 0), (1, 777), (2, 31)])
    def test_matches_xla_formulation(self, seed, n_valid_off):
        rng = np.random.default_rng(seed)
        g, l = 3, 60001
        corr = np.abs(rng.standard_normal((g, l))).astype(np.float32) * 0.1
        # Plant sparse candidates above threshold.
        for gi in range(g):
            pos = rng.choice(np.arange(10, l - 10), size=5, replace=False)
            corr[gi, pos] = rng.uniform(0.5, 1.0, 5).astype(np.float32)
        vl = l - n_valid_off
        thr_min = np.full(g, 0.25, np.float32)

        bmax, count, plateau, omax = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(vl)
        )
        rb, rc, rp, ro = _xla_reference(corr, thr_min, vl)
        np.testing.assert_array_equal(np.asarray(bmax), rb)
        np.testing.assert_array_equal(np.asarray(count), rc)
        np.testing.assert_array_equal(np.asarray(plateau), rp)
        np.testing.assert_array_equal(np.asarray(omax), ro)

    def test_plateaus(self):
        g, l = 1, 4096
        corr = np.zeros((g, l), np.float32)
        corr[0, 100] = 0.6  # len-1 peak
        corr[0, 200:202] = 0.7  # len-2 plateau (midpoint 200)
        corr[0, 300:303] = 0.8  # len-3 plateau (midpoint 301)
        corr[0, 400:404] = 0.9  # len-4 plateau -> flag
        corr[0, 99] = 0.1
        corr[0, 101] = 0.1  # make 100 a strict peak
        thr_min = np.array([0.25], np.float32)
        bmax, count, plateau, omax = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(l)
        )
        rb, rc, rp, ro = _xla_reference(corr, thr_min, l)
        np.testing.assert_array_equal(np.asarray(bmax), rb)
        np.testing.assert_array_equal(np.asarray(count), rc)
        assert bool(np.asarray(plateau)[0]) and bool(rp[0])
        assert float(omax[0]) == float(np.float32(0.9))

    def test_edges_excluded(self):
        g, l = 1, 2048
        corr = np.zeros((g, l), np.float32)
        corr[0, 0] = 1.0  # array edge — never a peak
        corr[0, l - 1] = 1.0
        thr_min = np.array([0.25], np.float32)
        bmax, count, plateau, _ = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(l)
        )
        assert float(count[0]) == 0.0
        assert not bool(np.asarray(plateau)[0])
        assert np.all(np.isneginf(np.asarray(bmax)))


class TestPallasEngineEquivalence:
    def test_end_to_end_matches_default_path(self, monkeypatch):
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

        rng = np.random.default_rng(7)
        t = np.arange(int(0.6 * SR)) / SR
        clip = (
            0.5 * np.sin(2 * np.pi * 640.0 * t) * np.hanning(len(t))
        ).astype(np.float32)
        audio = (0.01 * rng.standard_normal(25 * SR)).astype(np.float32)
        audio[4 * SR : 4 * SR + len(clip)] += clip
        audio[17 * SR : 17 * SR + len(clip)] += clip

        def run():
            det = AudioPatternDetector(
                [AudioClip(name="c", audio=clip, sample_rate=SR)],
                seconds_per_chunk=10,
            )
            stream = AudioStream(
                name="s",
                audio_stream=io.BytesIO(audio.tobytes()),
                sample_rate=SR,
            )
            return det.find_clip_in_audio(stream)

        monkeypatch.setenv("APD_PALLAS", "1")
        r_pallas, t_pallas = run()
        monkeypatch.delenv("APD_PALLAS")
        r_plain, t_plain = run()
        assert t_pallas == t_plain
        assert r_pallas == r_plain
        assert r_pallas is not None and len(r_pallas["c"]) >= 2
