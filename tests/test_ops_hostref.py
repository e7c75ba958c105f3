"""Differential tests: hostref ops vs scipy (the reference's own QA anchor).

Mirrors the reference's native-vs-scipy binding tests
(reference: native-helper/tests/test_python_bindings.py).
"""

import numpy as np
import pytest
import scipy.integrate
import scipy.signal

from audio_pattern_detector_tpu.ops import hostref


RNG = np.random.default_rng(1234)


class TestFindPeaks:
    def test_simple_peaks(self):
        x = np.array([0, 1, 0, 2, 0, 3, 0], dtype=np.float32)
        ours, _ = hostref.find_peaks(x)
        theirs, _ = scipy.signal.find_peaks(x)
        np.testing.assert_array_equal(ours, theirs)

    def test_plateau_midpoint(self):
        x = np.array([0, 1, 1, 1, 0, 2, 2, 0], dtype=np.float32)
        ours, _ = hostref.find_peaks(x)
        theirs, _ = scipy.signal.find_peaks(x)
        np.testing.assert_array_equal(ours, theirs)

    def test_edges_never_peaks(self):
        x = np.array([5, 1, 5], dtype=np.float32)
        ours, _ = hostref.find_peaks(x)
        assert len(ours) == 0

    @pytest.mark.parametrize("seed", range(5))
    def test_random_matches_scipy(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(5000).astype(np.float32)
        ours, _ = hostref.find_peaks(x)
        theirs, _ = scipy.signal.find_peaks(x)
        np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("seed", range(5))
    def test_height_distance_matches_scipy(self, seed):
        rng = np.random.default_rng(100 + seed)
        x = rng.standard_normal(5000).astype(np.float32)
        for height, distance in [(0.25, 50), (0.5, 7), (1.0, 500)]:
            ours, _ = hostref.find_peaks(x, height=height, distance=distance)
            theirs, _ = scipy.signal.find_peaks(x, height=height, distance=distance)
            np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("seed", range(3))
    def test_prominence_matches_scipy(self, seed):
        rng = np.random.default_rng(200 + seed)
        x = rng.standard_normal(2000).astype(np.float32)
        ours, _ = hostref.find_peaks(x, prominence=0.5)
        theirs, _ = scipy.signal.find_peaks(x, prominence=0.5)
        np.testing.assert_array_equal(ours, theirs)

    def test_prominence_small_like_tone_check(self):
        # The production use: rfft magnitude spectrum, prominence=0.05
        # (reference: detection_utils.py:31-32).
        sr = 8000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 1040.0 * t).astype(np.float32)
        mag = np.abs(np.fft.rfft(tone)).astype(np.float32)
        mag /= mag.max()
        ours, _ = hostref.find_peaks(mag, prominence=0.05)
        theirs, _ = scipy.signal.find_peaks(mag, prominence=0.05)
        np.testing.assert_array_equal(ours, theirs)


class TestResample:
    def test_clean_sine_matches_scipy(self):
        sr = 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        ours = hostref.resample(x, 8000)
        theirs = scipy.signal.resample(x.astype(np.float64), 8000)
        assert ours.dtype == np.float32
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_upsample_matches_scipy(self):
        rng = np.random.default_rng(7)
        x = np.sin(np.linspace(0, 40 * np.pi, 777)).astype(np.float32)
        ours = hostref.resample(x, 1234)
        theirs = scipy.signal.resample(x.astype(np.float64), 1234)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_identity(self):
        x = RNG.standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(hostref.resample(x, 100), x)

    def test_odd_n_matches_scipy_exactly(self):
        # When min(len, num) is odd there is no Nyquist bin and the slice
        # rule coincides with scipy bit-for-bit (to f64 FFT roundoff).
        rng = np.random.default_rng(21)
        x = rng.standard_normal(100).astype(np.float32)
        ours = hostref.resample(x, 51)
        theirs = scipy.signal.resample(x.astype(np.float64), 51)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_even_n_pins_reference_nyquist_rule(self):
        """Even min(len, num): the REFERENCE drops the Nyquist bin where
        scipy folds it (reference: lib.rs:253-273; its binding test allows
        atol=0.2 vs scipy for exactly this). Pin our output to the exact
        slice formula and record that it deviates from scipy on
        Nyquist-energy signals — parity is with the reference."""
        rng = np.random.default_rng(22)
        x = rng.standard_normal(101).astype(np.float32)
        m = 50
        ours = hostref.resample(x, m)

        spectrum = np.fft.fft(x.astype(np.float64))
        new_spec = np.zeros(m, dtype=np.complex128)
        pos, neg = (m + 1) // 2, (m - 1) // 2  # 25, 24 — bin 25 dropped
        new_spec[:pos] = spectrum[:pos]
        new_spec[m - neg:] = spectrum[len(x) - neg:]
        expect = (np.fft.ifft(new_spec) * (m / len(x))).real
        np.testing.assert_allclose(ours, expect.astype(np.float32), atol=1e-6)

        theirs = scipy.signal.resample(x.astype(np.float64), m)
        dev = float(np.max(np.abs(ours - theirs)))
        assert 1e-4 < dev < 0.5  # the documented Nyquist-handling gap

    def test_length(self):
        x = RNG.standard_normal(1000).astype(np.float32)
        assert len(hostref.resample(x, 313)) == 313


class TestResamplePreserveMaxima:
    def test_downsample_keeps_max(self):
        x = np.zeros(100, dtype=np.float32)
        x[37] = 5.0
        out = hostref.resample_preserve_maxima(x, 10)
        assert len(out) == 10
        assert out.max() == 5.0
        assert out[3] == 5.0

    def test_exact_length_and_upsample(self):
        x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        out = hostref.resample_preserve_maxima(x, 7)
        assert len(out) == 7
        # Upsampling repeats samples.
        assert set(out.tolist()) <= {1.0, 2.0, 3.0}

    def test_rejects_zero(self):
        with pytest.raises(ValueError):
            hostref.resample_preserve_maxima(np.ones(4, dtype=np.float32), 0)


class TestSimpson:
    @pytest.mark.parametrize("n", [2, 3, 4, 5, 10, 11, 100, 101])
    def test_matches_scipy(self, n):
        rng = np.random.default_rng(n)
        y = rng.standard_normal(n)
        ours = hostref.simpson(y)
        theirs = scipy.integrate.simpson(y)
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_short(self):
        assert hostref.simpson(np.array([3.0])) == 0.0
        assert hostref.simpson(np.array([])) == 0.0


class TestLoudness:
    def test_sine_loudness_reasonable(self):
        # Full-scale 997 Hz sine → about -3.01 dB LUFS at the K-weighted
        # passband (shelf gain ~0 dB at 1 kHz, offset -0.691).
        sr = 48000
        t = np.arange(2 * sr) / sr
        x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
        lufs = hostref.integrated_loudness(x, sr)
        assert -3.6 < lufs < -2.8

    def test_silence_is_neg_inf(self):
        assert hostref.integrated_loudness(np.zeros(8000, dtype=np.float32), 8000) == float("-inf")

    def test_short_signal_mean_square_path(self):
        sr = 8000
        x = 0.5 * np.sin(2 * np.pi * 1000 * np.arange(800) / sr).astype(np.float32)
        lufs = hostref.integrated_loudness(x, sr, block_size=0.1)
        assert np.isfinite(lufs)

    def test_normalize_gain(self):
        x = 0.1 * np.ones(100, dtype=np.float32)
        out = hostref.loudness_normalize(x, -30.0, -10.0)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)  # +20 dB then clipped
        out2 = hostref.loudness_normalize(x, -10.0, -30.0)
        np.testing.assert_allclose(out2, 0.01, rtol=1e-5)

    def test_normalize_nan_propagates(self):
        x = np.zeros(10, dtype=np.float32)
        out = hostref.loudness_normalize(x, float("-inf"), -16.0)
        assert np.isnan(out).all()

    def test_fir_matches_iir(self):
        rng = np.random.default_rng(3)
        sr = 8000
        x = rng.standard_normal(32000).astype(np.float32)
        fir = hostref.k_weighting_fir(sr, 4096)
        via_fir = np.convolve(x.astype(np.float64), fir)[: len(x)]
        via_iir = hostref.k_weighted_signal(x, sr)
        np.testing.assert_allclose(via_fir, via_iir, atol=1e-9)


class TestPearson:
    def test_perfect_correlation(self):
        x = np.arange(10, dtype=np.float32)
        assert hostref.pearson_correlation(x, 2 * x + 1) == pytest.approx(1.0)
        assert hostref.pearson_correlation(x, -x) == pytest.approx(-1.0)

    def test_zero_variance(self):
        x = np.ones(10, dtype=np.float32)
        y = np.arange(10, dtype=np.float32)
        assert hostref.pearson_correlation(x, y) == 0.0

    def test_matches_numpy_corrcoef(self):
        rng = np.random.default_rng(11)
        x = rng.standard_normal(500).astype(np.float32)
        y = rng.standard_normal(500).astype(np.float32)
        ours = hostref.pearson_correlation(x, y)
        theirs = np.corrcoef(x.astype(np.float64), y.astype(np.float64))[0, 1]
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_length_mismatch(self):
        with pytest.raises(ValueError):
            hostref.pearson_correlation(np.ones(3), np.ones(4))


class TestFftCorrelate:
    @pytest.mark.parametrize("n,m", [(100, 10), (64, 64), (1000, 3), (10, 10)])
    def test_matches_numpy_correlate(self, n, m):
        rng = np.random.default_rng(n * 1000 + m)
        a = rng.standard_normal(n).astype(np.float32)
        v = rng.standard_normal(m).astype(np.float32)
        ours = hostref.fft_correlate_1d(a, v, mode="full")
        theirs = np.correlate(a.astype(np.float64), v.astype(np.float64), "full")
        assert len(ours) == n + m - 1
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_peak_position_of_embedded_clip(self):
        rng = np.random.default_rng(5)
        clip = rng.standard_normal(50).astype(np.float32)
        audio = np.zeros(500, dtype=np.float32)
        offset = 123
        audio[offset : offset + 50] = clip
        corr = np.abs(hostref.fft_correlate_1d(audio, clip, "full"))
        # 'full' index of perfect alignment = offset + len(clip) - 1.
        assert int(np.argmax(corr)) == offset + 49
