"""Two-tier candidate detection: both tiers match the exact host path.

The production (lean) device program picks a 16-lane or full-k_detect lane
width at runtime from the raw candidate count (models/bank.py
_lean_group_packed). These tests engineer chunks that land on each side of
the tier boundary — and straddle it between consecutive chunks of one
stream — and assert the device results equal the exact host model.
"""

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector
from audio_pattern_detector_tpu.models import hostpath

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

SR = 8000


def _host_expected(bank, g, section):
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


def _count_candidates(bank, g, section):
    """Raw above-height candidate count, host model (find_peaks sans
    distance), to verify which tier a chunk exercises."""
    from audio_pattern_detector_tpu.ops import hostref

    norm = hostpath.normalize_section(section, SR)
    corr = np.abs(hostref.fft_correlate_1d(norm, g.clips_np[0], mode="full"))
    denom = max(float(g.self_max_np[0]), float(corr.max()))
    corr = corr / max(denom, 1e-38)
    peaks, _ = hostref.find_peaks(corr, height=bank.height_min)
    return len(peaks)


@pytest.fixture(scope="module")
def noise_clip_detector():
    rng = np.random.default_rng(3)
    clip = AudioClip(
        name="c",
        audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
    return det, det._ensure_bank()


def _chunk_with_copies(clip_audio, n_copies, seconds, seed):
    rng = np.random.default_rng(seed)
    audio = (0.004 * rng.standard_normal(seconds * SR)).astype(np.float32)
    for k in range(n_copies):
        o = int((0.3 + 1.05 * k) * SR)
        audio[o : o + SR] += clip_audio[: min(SR, len(audio) - o)]
    return audio


def test_small_tier_matches_host(noise_clip_detector):
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    audio = _chunk_with_copies(g.clips_np[0], 3, 20, seed=11)
    n = _count_candidates(bank, g, audio)
    assert 1 <= n <= 16, f"expected a small-tier chunk, got {n} candidates"
    assert bank.process_chunk(audio, None)["c"] == _host_expected(bank, g, audio)


def test_full_tier_matches_host(noise_clip_detector):
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    audio = _chunk_with_copies(g.clips_np[0], 18, 20, seed=12)
    n = _count_candidates(bank, g, audio)
    assert 16 < n <= g.k_detect, (
        f"expected a full-tier (non-overflow) chunk, got {n} candidates"
    )
    assert bank.process_chunk(audio, None)["c"] == _host_expected(bank, g, audio)


def test_tier_straddling_stream_matches_serial_host(noise_clip_detector):
    """Consecutive chunks flip tiers; each must stay exact (with lookback)."""
    det, bank = noise_clip_detector
    g = bank.classes[1]["groups"][0]
    sparse = _chunk_with_copies(g.clips_np[0], 2, 20, seed=13)
    dense = _chunk_with_copies(g.clips_np[0], 18, 20, seed=14)

    prev = None
    for chunk in (sparse, dense, sparse):
        if prev is not None:
            section = np.concatenate([prev[-g.sliding_window * SR :], chunk])
        else:
            section = chunk
        got = bank.process_chunk(chunk, prev)["c"]
        assert got == _host_expected(bank, g, section)
        prev = chunk


def test_marker_hit_exercises_tiers_exactly():
    """A real marker-tone hit produces a dense comb of raw candidates
    (full tier or host fallback); the device result must match the host."""
    t = np.arange(int(0.25 * SR)) / SR
    tone = (0.8 * np.sin(2 * np.pi * 1040.0 * t)).astype(np.float32)
    clip = AudioClip(
        name="m",
        audio=tone,
        sample_rate=SR,
        strategy="marker_tone",
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
    bank = det._ensure_bank()
    g = bank.classes[1]["groups"][0]

    rng = np.random.default_rng(5)
    audio = (0.002 * rng.standard_normal(20 * SR)).astype(np.float32)
    o = int(7.25 * SR)
    audio[o : o + len(tone)] += tone

    n = _count_candidates(bank, g, audio)
    assert n > 16, f"marker comb should exceed the small tier, got {n}"
    assert bank.process_chunk(audio, None)["m"] == _host_expected(bank, g, audio)


class TestExactnessByConstruction:
    """Every tier consumes the SAME normalised correlation array
    (bank_correlate's output: divide-form values, exact zeros past
    valid_len), so rows the old raw-space lean tier had to ulp-guard —
    threshold-boundary peaks, tail-adjacent candidates — now return
    unflagged payloads that are bitwise the wide tier's by construction."""

    @pytest.fixture(scope="class")
    def lean_env(self):
        import jax.numpy as jnp
        from audio_pattern_detector_tpu.models.bank import _lean_group_packed
        from audio_pattern_detector_tpu.ops.verify import (
            build_normal_verify_consts,
        )

        m = 257
        rng = np.random.default_rng(7)
        cc = np.abs(rng.standard_normal((1, 2 * m - 1))).astype(np.float32)
        cc /= cc.max()
        consts = build_normal_verify_consts(cc, m, SR)

        def run(corr_row, valid_len, height_min=0.25, wide=False):
            corr = jnp.asarray(corr_row[None, :].astype(np.float32))
            return np.asarray(
                _lean_group_packed(
                    jnp.zeros(8, dtype=np.float32),  # norm unused (normal)
                    corr,
                    jnp.int32(valid_len),
                    "normal",
                    m,
                    64,  # k_detect
                    16,  # k_verify
                    height_min,
                    consts,
                    wide=wide,
                )
            )[0]

        return run, m

    @staticmethod
    def _row(L, peaks, valid_len=None):
        x = np.full(L, 1e-4, dtype=np.float32)
        for pos, h in peaks:
            x[pos - 1], x[pos], x[pos + 1] = h * 0.6, h, h * 0.6
        if valid_len is not None:
            # Production contract: normalised corr is exactly zero past
            # valid_len (bank_correlate zeroes before dividing).
            x[valid_len:] = 0.0
        return x

    def _assert_unflagged_bitwise_wide(self, run, x, vl):
        lean, wide = run(x, vl), run(x, vl, wide=True)
        assert lean[2 * 16] == 0.0, "lean row unexpectedly flagged"
        assert wide[2 * 16] == 0.0, "wide row unexpectedly flagged"
        np.testing.assert_array_equal(lean, wide)

    def test_clear_margin_row(self, lean_env):
        run, m = lean_env
        L = 6000
        vl = L - 100
        self._assert_unflagged_bitwise_wide(
            run, self._row(L, [(1000, 0.9)], vl), vl
        )

    def test_threshold_boundary_row(self, lean_env):
        run, m = lean_env
        L = 6000
        vl = L - 100
        # Peak exactly at height_min: under the old raw-space lean tier
        # the multiply-form threshold could disagree with the wide tier's
        # divide form by 1 ulp here (it was guard-flagged); both tiers now
        # compare the identical f32 value against the identical scalar.
        self._assert_unflagged_bitwise_wide(
            run, self._row(L, [(1000, 0.25)], vl), vl
        )

    def test_near_ulp_boundary_row(self, lean_env):
        run, m = lean_env
        L = 6000
        vl = L - 100
        h = float(np.float32(0.25) + np.float32(0.25) * np.float32(1.19e-7))
        self._assert_unflagged_bitwise_wide(
            run, self._row(L, [(1000, h)], vl), vl
        )

    def test_tail_reading_candidate(self, lean_env):
        run, m = lean_env
        L = 6000
        vl = L - 100
        # Surviving candidate whose verify slice [pos-(m-1), pos+m-1]
        # crosses valid_len: the old raw-space lean tier read FFT noise
        # there (guard-flagged); both tiers now read the same exact zeros.
        self._assert_unflagged_bitwise_wide(
            run, self._row(L, [(vl - m + 3, 0.9)], vl), vl
        )

    def test_interior_candidate_near_tail(self, lean_env):
        run, m = lean_env
        L = 6000
        vl = L - 100
        self._assert_unflagged_bitwise_wide(
            run, self._row(L, [(vl - m, 0.9)], vl), vl
        )


class TestRowGranularRerun:
    """Flag-2 rows re-derive through the single-ROW full-tier program when
    few (the hit path: one extra launch covering 1/G of the class work);
    whole-class rerun only above the row threshold."""

    def test_single_dense_row_uses_row_rerun(self, noise_clip_detector, monkeypatch):
        det, bank = noise_clip_detector
        g = bank.classes[1]["groups"][0]
        audio = _chunk_with_copies(g.clips_np[0], 18, 20, seed=21)
        assert _count_candidates(bank, g, audio) > 16

        row_calls, cls_calls = [], []
        orig_row = bank._full_tier_row
        orig_cls = bank._full_tier_packed
        monkeypatch.setattr(
            bank, "_full_tier_row",
            lambda *a, **k: row_calls.append(a[:3]) or orig_row(*a, **k),
        )
        monkeypatch.setattr(
            bank, "_full_tier_packed",
            lambda *a, **k: cls_calls.append(1) or orig_cls(*a, **k),
        )
        got = bank.process_chunk(audio, None)["c"]
        assert got == _host_expected(bank, g, audio)
        assert row_calls == [(1, 0, 0)]
        assert not cls_calls

    def test_many_flagged_rows_use_class_rerun(self, monkeypatch):
        """> _ROW_RERUN_MAX flagged rows in one class switch to ONE
        whole-class rerun launch."""
        rng = np.random.default_rng(31)
        base = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        # 6 clips sharing one group; a chunk stuffed with copies of each
        # floods every row's small tier.
        clips = [
            AudioClip(name=f"c{i}", audio=base * (0.8 + 0.04 * i), sample_rate=SR)
            for i in range(6)
        ]
        det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=24)
        bank = det._ensure_bank()
        g = bank.classes[1]["groups"][0]
        audio = _chunk_with_copies(base, 20, 24, seed=32)

        row_calls, cls_calls = [], []
        orig_row = bank._full_tier_row
        orig_cls = bank._full_tier_packed
        monkeypatch.setattr(
            bank, "_full_tier_row",
            lambda *a, **k: row_calls.append(1) or orig_row(*a, **k),
        )
        monkeypatch.setattr(
            bank, "_full_tier_packed",
            lambda *a, **k: cls_calls.append(1) or orig_cls(*a, **k),
        )
        got = bank.process_chunk(audio, None)
        for ci, name in enumerate(g.names):
            assert got[name] == _host_expected_row(bank, g, ci, audio)
        assert cls_calls == [1]
        assert not row_calls

    def test_marker_comb_hit_clears_in_program(self, monkeypatch):
        """A real marker-tone hit floods the row with hundreds of raw
        candidates but has only 1-3 greedy survivors — the lean tier
        resolves it exactly in-program (greedy_survivors_blockwise) and
        NO rerun launch happens."""
        t = np.arange(int(0.25 * SR)) / SR
        tone = (0.8 * np.sin(2 * np.pi * 1040.0 * t)).astype(np.float32)
        clip = AudioClip(
            name="m", audio=tone, sample_rate=SR, strategy="marker_tone",
        )
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
        bank = det._ensure_bank()
        g = bank.classes[1]["groups"][0]
        rng = np.random.default_rng(5)
        audio = (0.002 * rng.standard_normal(20 * SR)).astype(np.float32)
        o = int(7.25 * SR)
        audio[o : o + len(tone)] += tone
        assert _count_candidates(bank, g, audio) > 16

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
        assert bank.process_chunk(audio, None)["m"] == _host_expected(bank, g, audio)
        assert not calls  # coverage proof cleared the flag in-program


def _host_expected_row(bank, g, ci, section):
    return hostpath.process_section_host(
        audio_section=section,
        clip=g.clips_np[ci],
        correlation_clip=g.corr_clips_np[ci],
        correlation_clip_absolute_max=float(g.self_max_np[ci]),
        sr=SR,
        height_min=bank.height_min,
        is_short_clip=g.clip_len / SR < 0.5,
        tone_frequency=g.tone_freqs[ci],
        verification_params=g.verification_params[ci],
    )


class TestBlockGreedySurvivors:
    """The lean tier computes the exact greedy survivor set in-program for
    ANY raw candidate count (ops/peaks.py::greedy_survivors_blockwise):
    dense hit combs resolve without a rerun launch, and the 16-lane
    payload must be bitwise the wide tier's. Only rows with more than 16
    SURVIVORS flag for the rerun."""

    M = 257
    K_DETECT = 64
    K_VERIFY = 16

    @pytest.fixture(scope="class")
    def runner(self):
        import jax.numpy as jnp
        from audio_pattern_detector_tpu.models.bank import _lean_group_packed
        from audio_pattern_detector_tpu.ops.verify import (
            build_normal_verify_consts,
        )

        m = self.M
        rng = np.random.default_rng(17)
        cc = np.abs(rng.standard_normal((1, 2 * m - 1))).astype(np.float32)
        cc /= cc.max()
        consts = build_normal_verify_consts(cc, m, SR)

        def run(corr_row, valid_len, wide=False):
            # Both tiers consume the same normalised correlation array, so
            # lean vs wide payloads are comparable bitwise by construction.
            corr = jnp.asarray(corr_row[None, :].astype(np.float32))
            return np.asarray(
                _lean_group_packed(
                    jnp.zeros(8, dtype=np.float32),
                    corr,
                    jnp.int32(valid_len),
                    "normal",
                    m,
                    self.K_DETECT,
                    self.K_VERIFY,
                    0.25,
                    consts,
                    wide=wide,
                )
            )[0]

        return run

    @staticmethod
    def _row(L, peaks):
        x = np.full(L, 1e-4, dtype=np.float32)
        for pos, h in peaks:
            x[pos - 1], x[pos], x[pos + 1] = h * 0.6, h, h * 0.6
        return x

    def _comb(self, L, center, n_teeth, top=0.9, step=0.02, spacing=12):
        """Comb of n_teeth candidates, tallest at center, every tooth
        within M-1 of it — the shape of a real marker/clip hit."""
        peaks = [(center, top)]
        for k in range(1, n_teeth):
            side = 1 if k % 2 else -1
            peaks.append((center + side * spacing * ((k + 1) // 2), top - step * k))
        return self._row(L, peaks)

    def test_comb_overflow_unflagged(self, runner):
        x = self._comb(6000, 1500, n_teeth=25)
        packed = runner(x, valid_len=5900)
        assert packed[2 * self.K_VERIFY] == 0.0  # dense comb, 1 survivor

    def test_comb_payload_is_bitwise_wide(self, runner):
        x = self._comb(6000, 1500, n_teeth=25)
        lean, wide = runner(x, 5900), runner(x, 5900, wide=True)
        assert wide[2 * self.K_VERIFY] == 0.0
        np.testing.assert_array_equal(lean, wide)

    def test_survivor_overflow_keeps_flag(self, runner):
        """20 candidates spaced beyond M all survive the greedy filter —
        more than the 16 payload lanes, so the rerun flag must fire."""
        peaks = [(300 + 600 * k, 0.9 - 0.01 * k) for k in range(20)]
        packed = runner(self._row(20000, peaks), valid_len=19900)
        assert packed[2 * self.K_VERIFY] == 2.0

    def test_boundary_tie_handled_exactly(self, runner):
        """Value ties that would straddle a top-16 capture boundary are a
        non-event for the survivor-based tier: the greedy resolves them by
        the priority rule in-program, no flag, payload bitwise the
        wide tier's."""
        center = 1500
        peaks = [(center, 0.9)]
        for k in range(1, 16):
            side = 1 if k % 2 else -1
            peaks.append((center + side * 12 * ((k + 1) // 2), 0.9 - 0.02 * k))
        # 17th candidate ties the 16th-tallest exactly, within M of centre.
        peaks.append((center + 100, np.float32(0.9 - 0.02 * 15)))
        x = self._row(6000, peaks)
        lean, wide = runner(x, 5900), runner(x, 5900, wide=True)
        assert lean[2 * self.K_VERIFY] == 0.0
        np.testing.assert_array_equal(lean, wide)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_combs_lean_equals_wide(self, runner, seed):
        """Randomised hit-shaped rows: whenever the lean program leaves a
        row unflagged, its payload must equal the wide tier's bitwise."""
        rng = np.random.default_rng(100 + seed)
        L = 24000
        x = np.full(L, 1e-4, dtype=np.float32)
        for c in rng.integers(400, L - 400, size=rng.integers(1, 4)):
            n = int(rng.integers(18, 30))
            top = float(rng.uniform(0.5, 1.0))
            sp = int(rng.integers(6, 18))
            for k in range(n):
                side = 1 if k % 2 else -1
                p = int(c) + side * sp * ((k + 1) // 2)
                h = top * float(rng.uniform(0.35, 0.99)) if k else top
                x[p - 1], x[p], x[p + 1] = h * 0.6, h, h * 0.6
        lean, wide = runner(x, L - 100), runner(x, L - 100, wide=True)
        if lean[2 * self.K_VERIFY] == 0.0:
            np.testing.assert_array_equal(lean, wide)
        else:
            # Not cleared: the rerun path re-derives it — just sanity-check
            # the wide tier agrees on flag semantics.
            assert wide[2 * self.K_VERIFY] in (0.0, 1.0)


class TestBlockedLeanVariant:
    """APD_BLOCK_LEAN=1 (ops/peaks.py::greedy_survivors_rederive): the
    block-summary lean tier — no (G, L) scored/mask buffers, per-round
    candidate re-derivation on ±2-halo windows — must be bitwise the
    default lean tier on EVERY row shape, including candidates and
    plateau runs straddling the 512-sample block boundaries its gathers
    are aligned to."""

    M = 257
    K_VERIFY = 16
    BLOCK = 512  # ops/peaks._TOPK_BLOCK — gather alignment under test

    @pytest.fixture(scope="class")
    def runner(self):
        import jax.numpy as jnp
        from audio_pattern_detector_tpu.models.bank import _lean_group_packed
        from audio_pattern_detector_tpu.ops.verify import (
            build_normal_verify_consts,
        )

        m = self.M
        rng = np.random.default_rng(23)
        cc = np.abs(rng.standard_normal((1, 2 * m - 1))).astype(np.float32)
        cc /= cc.max()
        consts = build_normal_verify_consts(cc, m, SR)

        def run(corr_row, valid_len, blocked=False):
            corr = jnp.asarray(corr_row[None, :].astype(np.float32))
            return np.asarray(
                _lean_group_packed(
                    jnp.zeros(8, dtype=np.float32),
                    corr,
                    jnp.int32(valid_len),
                    "normal",
                    m,
                    64,
                    self.K_VERIFY,
                    0.25,
                    consts,
                    blocked=blocked,
                )
            )[0]

        return run

    def _assert_bitwise(self, run, x, vl):
        default, blocked = run(x, vl), run(x, vl, blocked=True)
        np.testing.assert_array_equal(default, blocked)
        return default

    @staticmethod
    def _row(L, peaks):
        x = np.full(L, 1e-4, dtype=np.float32)
        for pos, h in peaks:
            x[pos - 1], x[pos], x[pos + 1] = h * 0.6, h, h * 0.6
        return x

    def test_block_boundary_candidates(self, runner):
        """One candidate at every offset around a block edge (the gather
        window's halo must supply the true ±2 neighbours)."""
        L, vl, B = 6000, 5900, self.BLOCK
        for edge in (B, 2 * B, 4 * B):
            for off in (-2, -1, 0, 1, 2):
                x = self._row(L, [(edge + off, 0.9)])
                out = self._assert_bitwise(runner, x, vl)
                assert out[0] == edge + off, (edge, off)

    def test_plateau_runs_straddling_block_edge(self, runner):
        """Length-2/3 plateau runs crossing a block boundary: midpoint
        selection must agree bitwise between the full-width mask and the
        window re-derivation."""
        L, vl, B = 6000, 5900, self.BLOCK
        for start in (B - 2, B - 1, B, 2 * B - 1):
            for run_len in (2, 3):
                x = np.full(L, 1e-4, dtype=np.float32)
                x[start - 1] = 0.5
                x[start : start + run_len] = 0.9
                x[start + run_len] = 0.5
                self._assert_bitwise(runner, x, vl)

    def test_tie_across_block_edge(self, runner):
        """Two equal-height candidates in adjacent blocks: the greedy's
        lower-index tie rule must pick the same one in both variants."""
        L, vl, B = 6000, 5900, self.BLOCK
        x = self._row(L, [(B - 10, 0.9), (B + 10, 0.9)])
        out = self._assert_bitwise(runner, x, vl)
        assert out[0] == B - 10

    def test_valid_len_edges(self, runner):
        """Candidates at/near valid_len, and valid_len landing mid-block:
        the -inf tail must mask identically in both formulations."""
        L = 6000
        for vl in (L - 100, 3 * self.BLOCK + 7, L):
            x = self._row(L, [(vl - self.M, 0.9), (1000, 0.5)])
            self._assert_bitwise(runner, x, max(vl, 1200))

    def test_dense_comb_and_overflow_flags(self, runner):
        """Hit-shaped combs (1 survivor) and >16-survivor rows must carry
        identical payloads AND identical flag columns."""
        x = np.full(24000, 1e-4, dtype=np.float32)
        for k in range(25):
            side = 1 if k % 2 else -1
            p = 1500 + side * 12 * ((k + 1) // 2)
            h = 0.9 - 0.02 * k
            x[p - 1], x[p], x[p + 1] = h * 0.6, h, h * 0.6
        out = self._assert_bitwise(runner, x, 23900)
        assert out[2 * self.K_VERIFY] == 0.0
        peaks = [(300 + 600 * k, 0.9 - 0.01 * k) for k in range(20)]
        out = self._assert_bitwise(runner, self._row(20000, peaks), 19900)
        assert out[2 * self.K_VERIFY] == 2.0

    def test_long_plateau_flag(self, runner):
        x = np.full(6000, 1e-4, dtype=np.float32)
        x[2000:2004] = 0.9  # length-4 run: host-fallback flag 1
        out = self._assert_bitwise(runner, x, 5900)
        assert out[2 * self.K_VERIFY] == 1.0

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_rows_bitwise(self, runner, seed):
        rng = np.random.default_rng(200 + seed)
        L = int(rng.integers(4000, 30000))
        x = np.full(L, 1e-4, dtype=np.float32)
        for c in rng.integers(400, L - 400, size=rng.integers(1, 5)):
            n = int(rng.integers(1, 30))
            top = float(rng.uniform(0.3, 1.0))
            sp = int(rng.integers(6, 20))
            for k in range(n):
                side = 1 if k % 2 else -1
                p = int(c) + side * sp * ((k + 1) // 2)
                h = top * float(rng.uniform(0.3, 0.99)) if k else top
                x[p - 1], x[p], x[p + 1] = h * 0.6, h, h * 0.6
        self._assert_bitwise(runner, x, L - int(rng.integers(10, 300)))

    def test_detector_end_to_end_identical(self, monkeypatch):
        """A full AudioPatternDetector built under APD_BLOCK_LEAN=1
        returns identical detections on a hit-bearing stream."""
        rng = np.random.default_rng(9)
        clip = AudioClip(
            name="c",
            audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
            sample_rate=SR,
        )
        audio = _chunk_with_copies(clip.audio, 3, 20, seed=5)
        results = {}
        for env, tag in ((None, "default"), ("1", "blocked")):
            if env is None:
                monkeypatch.delenv("APD_BLOCK_LEAN", raising=False)
            else:
                monkeypatch.setenv("APD_BLOCK_LEAN", env)
            det = AudioPatternDetector(
                audio_clips=[clip], seconds_per_chunk=20
            )
            bank = det._ensure_bank()
            h = bank.dispatch_chunk(audio, previous_chunk=None)
            results[tag] = bank.collect_chunk(h)
        assert results["blocked"] == results["default"]
