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
    _shift,
    long_plateau_present,
    short_run_local_maxima_mask,
)

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

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
    tol = jnp.float32(8.0 * np.finfo(np.float32).eps) * x
    pair_near = jnp.zeros_like(x, dtype=bool)
    for d in (-2, -1, 1, 2):
        n = _shift(x, d)
        pair_near |= (n != x) & (n != -jnp.inf) & (jnp.abs(x - n) <= tol)
    near = jnp.any((x >= thr) & jnp.isfinite(x) & pair_near, axis=1)
    return (
        np.asarray(bmax),
        np.asarray(count),
        np.asarray(plateau),
        np.asarray(omax),
        np.asarray(near),
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

        bmax, count, plateau, omax, near = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(vl)
        )
        rb, rc, rp, ro, rn = _xla_reference(corr, thr_min, vl)
        np.testing.assert_array_equal(np.asarray(bmax), rb)
        np.testing.assert_array_equal(np.asarray(count), rc)
        np.testing.assert_array_equal(np.asarray(plateau), rp)
        np.testing.assert_array_equal(np.asarray(omax), ro)
        np.testing.assert_array_equal(np.asarray(near), rn)

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
        bmax, count, plateau, omax, near = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(l)
        )
        rb, rc, rp, ro, rn = _xla_reference(corr, thr_min, l)
        np.testing.assert_array_equal(np.asarray(bmax), rb)
        np.testing.assert_array_equal(np.asarray(count), rc)
        assert bool(np.asarray(plateau)[0]) and bool(rp[0])
        assert float(omax[0]) == float(np.float32(0.9))

    def test_near_collapse_flag(self):
        """Rows where a candidate-height sample has a strictly-unequal
        mask-comparison partner within 8 ulp must flag (f32 division can
        collapse the pair to quotient equality, invalidating the raw-space
        block seeds); exact plateaus and comfortable margins must not."""
        g, l = 3, 2048
        corr = np.zeros((g, l), np.float32)
        v = np.float32(0.5)
        # Row 0: strict peak whose left partner sits 1 ulp below.
        corr[0, 500] = v
        corr[0, 499] = np.nextafter(v, np.float32(0.0))
        # Row 1: clean strict peak + an exact len-2 plateau (equality is
        # preserved by division — no hazard).
        corr[1, 300] = 0.6
        corr[1, 299] = 0.3
        corr[1, 301] = 0.3
        corr[1, 800:802] = 0.7
        # Row 2: the 1-ulp pair exists but BELOW candidate height.
        corr[2, 700] = np.float32(0.1)
        corr[2, 699] = np.nextafter(np.float32(0.1), np.float32(0.0))
        thr_min = np.full(g, 0.25, np.float32)
        *rest, near = candidate_scan(
            jnp.asarray(corr), jnp.asarray(thr_min), jnp.int32(l)
        )
        near = np.asarray(near)
        assert bool(near[0])
        assert not bool(near[1])
        assert not bool(near[2])
        _, _, _, _, rn = _xla_reference(corr, thr_min, l)
        np.testing.assert_array_equal(near, rn)

    def test_edges_excluded(self):
        g, l = 1, 2048
        corr = np.zeros((g, l), np.float32)
        corr[0, 0] = 1.0  # array edge — never a peak
        corr[0, l - 1] = 1.0
        thr_min = np.array([0.25], np.float32)
        bmax, count, plateau, _, _ = candidate_scan(
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


class TestPallasGreedyHitPath:
    """The Pallas lean path shares the in-program greedy survivors: a
    real hit's dense candidate comb must resolve in the single launch
    (no rerun), matching the exact host model — same contract the XLA
    lean path is pinned to in tests/test_two_tier_detect.py."""

    def _host_expected(self, bank, g, section):
        from audio_pattern_detector_tpu.models import hostpath

        return hostpath.process_section_host(
            audio_section=section,
            clip=g.clips_np[0],
            correlation_clip=g.corr_clips_np[0],
            correlation_clip_absolute_max=float(g.self_max_np[0]),
            sr=SR,
            height_min=bank.height_min,
            is_short_clip=g.clip_len / SR < 0.5,
            tone_frequency=g.tone_freqs[0],
            verification_params=g.verification_params[0],
        )

    def _run_no_rerun(self, monkeypatch, clip_audio, audio, **clip_kw):
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip

        monkeypatch.setenv("APD_PALLAS", "1")
        det = AudioPatternDetector(
            [AudioClip(name="c", audio=clip_audio, sample_rate=SR, **clip_kw)],
            seconds_per_chunk=20,
        )
        bank = det._ensure_bank()
        assert bank._pallas
        g = bank.classes[1]["groups"][0]

        calls = []
        orig_row = bank._full_tier_row
        orig_cls = bank._full_tier_packed
        monkeypatch.setattr(
            bank, "_full_tier_row",
            lambda *a, **k: calls.append("row") or orig_row(*a, **k),
        )
        monkeypatch.setattr(
            bank, "_full_tier_packed",
            lambda *a, **k: calls.append("class") or orig_cls(*a, **k),
        )
        got = bank.process_chunk(audio, None)["c"]
        assert got == self._host_expected(bank, g, audio)
        assert not calls, f"pallas lean path launched a rerun: {calls}"

    def test_marker_comb_hit_clears_in_program(self, monkeypatch):
        t = np.arange(int(0.25 * SR)) / SR
        tone = (0.8 * np.sin(2 * np.pi * 1040.0 * t)).astype(np.float32)
        rng = np.random.default_rng(5)
        audio = (0.002 * rng.standard_normal(20 * SR)).astype(np.float32)
        o = int(7.25 * SR)
        audio[o : o + len(tone)] += tone
        self._run_no_rerun(
            monkeypatch, tone, audio,
            strategy="marker_tone",
            strategy_params={"dominant_frequency_hz": 1040.0},
        )

    def test_normal_hit_clears_in_program(self, monkeypatch):
        rng = np.random.default_rng(42)
        clip = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        audio = (0.004 * rng.standard_normal(20 * SR)).astype(np.float32)
        o = int(6.4 * SR)
        audio[o : o + SR] += clip
        self._run_no_rerun(monkeypatch, clip, audio)

    def test_survivor_overflow_reroutes(self, monkeypatch):
        """> _SMALL_TIER distance-spaced survivors must still flag for
        the exact rerun under the Pallas path (overflow semantics)."""
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip

        rng = np.random.default_rng(3)
        clip = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        monkeypatch.setenv("APD_PALLAS", "1")
        det = AudioPatternDetector(
            [AudioClip(name="c", audio=clip, sample_rate=SR)],
            seconds_per_chunk=24,
        )
        bank = det._ensure_bank()
        g = bank.classes[1]["groups"][0]
        audio = (0.004 * rng.standard_normal(24 * SR)).astype(np.float32)
        for k in range(20):
            o = int((0.3 + 1.05 * k) * SR)
            audio[o : o + SR] += clip[: min(SR, len(audio) - o)]

        reruns = []
        orig_row = bank._full_tier_row
        monkeypatch.setattr(
            bank, "_full_tier_row",
            lambda *a, **k: reruns.append(1) or orig_row(*a, **k),
        )
        from audio_pattern_detector_tpu.models import hostpath

        expected = hostpath.process_section_host(
            audio_section=audio,
            clip=g.clips_np[0],
            correlation_clip=g.corr_clips_np[0],
            correlation_clip_absolute_max=float(g.self_max_np[0]),
            sr=SR,
            height_min=bank.height_min,
            is_short_clip=False,
            tone_frequency=g.tone_freqs[0],
            verification_params=g.verification_params[0],
        )
        assert bank.process_chunk(audio, None)["c"] == expected
        assert reruns  # 20 spaced survivors > 16 lanes

    def test_big_chunk_falls_back_to_xla(self, monkeypatch):
        """full_len > LPAD (chunk-seconds 120+ / auto-perf sizing) exceeds
        the Mosaic scan's coverage: the class program must silently use
        the XLA formulation, not fail the launch."""
        from audio_pattern_detector_tpu.models.detector import (
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

        rng = np.random.default_rng(11)
        clip = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        audio = (0.01 * rng.standard_normal(130 * SR)).astype(np.float32)
        audio[40 * SR : 41 * SR] += clip
        audio[100 * SR : 101 * SR] += clip

        def run():
            det = AudioPatternDetector(
                [AudioClip(name="c", audio=clip, sample_rate=SR)],
                seconds_per_chunk=120,
            )
            stream = AudioStream(
                name="s",
                audio_stream=io.BytesIO(audio.tobytes()),
                sample_rate=SR,
            )
            return det.find_clip_in_audio(stream)

        monkeypatch.setenv("APD_PALLAS", "1")
        r_pallas, _ = run()
        monkeypatch.delenv("APD_PALLAS")
        r_plain, _ = run()
        assert r_pallas == r_plain
        assert r_pallas is not None and len(r_pallas["c"]) == 2


class TestPallasBatchDispatchDefault:
    """Round 4 made the kernel the DEFAULT for scan-batch dispatch on
    TPU (models/bank.py::__init__, bank._pallas_batch). CI runs on CPU
    where that default resolves to off, so this suite forces the flag
    and exercises the exact production combination — the kernel inside
    the batched scan program — in interpret mode, on audio that carries
    real normal-clip and marker hits (advisor round 4: the noise-only
    probe never drove the verify/greedy path under the new default)."""

    def test_scan_batch_hit_bearing_identity(self):
        from audio_pattern_detector_tpu.models.detector import (
            MARKER_TONE_STRATEGY,
            AudioPatternDetector,
        )
        from audio_pattern_detector_tpu.utils.clip import AudioClip

        rng = np.random.default_rng(23)
        t = np.arange(int(0.6 * SR)) / SR
        clip = (
            0.5 * np.sin(2 * np.pi * 640.0 * t) * np.hanning(len(t))
        ).astype(np.float32)
        freq = 941.0
        tm = np.arange(int(0.25 * SR)) / SR
        marker = np.sin(2 * np.pi * freq * tm).astype(np.float32)
        clips = [
            AudioClip(name="c", audio=clip, sample_rate=SR),
            AudioClip(
                name="m",
                audio=marker,
                sample_rate=SR,
                strategy=MARKER_TONE_STRATEGY,
                strategy_params={"dominant_frequency_hz": freq},
            ),
        ]

        audio = 0.01 * rng.standard_normal(40 * SR)
        audio[4 * SR : 4 * SR + len(clip)] += clip
        audio[17 * SR : 17 * SR + len(marker)] += 0.8 * marker
        audio[33 * SR : 33 * SR + len(clip)] += clip
        # int16 grid: the scan-batch path bit-packs int16 rows — the
        # production upload shape for WAV/stdin sources.
        audio_i16 = np.clip(
            np.round(audio * 32768), -32768, 32767
        ).astype(np.int16)

        def run(pallas_batch: bool):
            det = AudioPatternDetector(clips, seconds_per_chunk=10)
            bank = det._ensure_bank()
            bank._pallas_batch = pallas_batch
            return det.find_clip_in_array(
                audio_i16, batch_size=2, batch_mode="scan"
            )

        r_pallas, t_pallas = run(True)
        r_plain, t_plain = run(False)
        assert t_pallas == t_plain
        assert r_pallas == r_plain
        assert len(r_pallas["c"]) == 2 and len(r_pallas["m"]) == 1
