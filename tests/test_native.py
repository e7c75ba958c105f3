"""C++ native runtime vs exact numpy host ops.

Every native op must agree with hostref bit-for-bit (integer outputs) or to
f64 round-off (scalar outputs); the numpy fallback path must work when the
shared library is unavailable.
"""

import numpy as np
import pytest

from audio_pattern_detector_tpu import native
from audio_pattern_detector_tpu.ops import hostref

RNG = np.random.default_rng(99)

requires_native = pytest.mark.skipif(
    not native.native_available(), reason="C++ runtime not built"
)


@requires_native
class TestNativeParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_find_peaks(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(30000).astype(np.float32)
        for kwargs in [
            dict(height=0.5, distance=37),
            dict(height=0.25, distance=1824),
            dict(prominence=0.8),
            dict(height=0.1, distance=5, prominence=0.3),
            dict(),
        ]:
            a, _ = native.find_peaks(x, **kwargs)
            b, _ = hostref.find_peaks(x, **kwargs)
            np.testing.assert_array_equal(a, b)

    def test_loudness(self):
        x = (0.1 * RNG.standard_normal(80000)).astype(np.float32)
        a = native.integrated_loudness(x, 8000)
        b = hostref.integrated_loudness(x, 8000)
        assert abs(a - b) < 1e-9

    def test_biquad_bitwise(self):
        """apd_biquad_f64 must be BIT-identical to scipy's lfilter DF2T —
        it replaces scipy in hostref._biquad, whose output bits feed the
        bank constants and every golden timestamp."""
        scipy_signal = pytest.importorskip("scipy.signal")
        b = np.array([0.9, -1.7, 0.8])
        a = np.array([1.0, -1.9, 0.91])
        for n in (1, 2, 7, 8000, 480000):
            x = RNG.standard_normal(n)
            want = scipy_signal.lfilter(b, a, x)
            got = native.biquad_f64(b, a, x)
            assert got is not None
            np.testing.assert_array_equal(
                want.view(np.uint64), got.view(np.uint64)
            )

    def test_biquad_python_fallback_bitwise(self):
        """The pure-python tier of hostref._biquad uses the same op order."""
        scipy_signal = pytest.importorskip("scipy.signal")
        b = np.array([0.37, -0.61, 0.24])
        a = np.array([1.0, -1.2, 0.5])
        x = RNG.standard_normal(5000)
        want = scipy_signal.lfilter(b, a, x)
        out = np.empty_like(x)
        z0 = 0.0
        z1 = 0.0
        b0, b1, b2 = b
        _, a1, a2 = a
        for i, xi in enumerate(x):
            y = z0 + b0 * xi
            z0 = z1 + b1 * xi - a1 * y
            z1 = b2 * xi - a2 * y
            out[i] = y
        np.testing.assert_array_equal(want.view(np.uint64), out.view(np.uint64))

    def test_loudness_silence(self):
        assert native.integrated_loudness(np.zeros(8000, np.float32), 8000) == float("-inf")

    def test_loudness_normalize(self):
        x = (0.1 * RNG.standard_normal(1000)).astype(np.float32)
        a = native.loudness_normalize(x, -30.0, -16.0)
        b = hostref.loudness_normalize(x, -30.0, -16.0)
        np.testing.assert_array_equal(a, b)

    def test_loudness_normalize_nan(self):
        out = native.loudness_normalize(np.zeros(4, np.float32), float("-inf"), -16.0)
        assert np.isnan(out).all()

    def test_pearson(self):
        x = RNG.standard_normal(505).astype(np.float32)
        y = RNG.standard_normal(505).astype(np.float32)
        assert abs(
            native.pearson_correlation(x, y) - hostref.pearson_correlation(x, y)
        ) < 1e-12

    def test_pearson_length_mismatch(self):
        with pytest.raises(ValueError):
            native.pearson_correlation(np.ones(3), np.ones(4))

    @pytest.mark.parametrize("n", [2, 3, 10, 101, 1000])
    def test_simpson(self, n):
        y = RNG.standard_normal(n).astype(np.float64)
        assert abs(native.simpson(y) - hostref.simpson(y)) < 1e-10

    @pytest.mark.parametrize("n,target", [(5000, 101), (1459, 101), (8000, 505), (3, 7)])
    def test_resample_preserve_maxima(self, n, target):
        x = RNG.standard_normal(n).astype(np.float32)
        a = native.resample_preserve_maxima(x, target)
        b = hostref.resample_preserve_maxima(x, target)
        np.testing.assert_array_equal(a, b)

    def test_rpm_rejects_zero(self):
        with pytest.raises(ValueError):
            native.resample_preserve_maxima(np.ones(4, np.float32), 0)

    def test_pcm16_mono(self):
        raw = RNG.integers(-32768, 32767, 1000).astype(np.int16)
        out = native.pcm16_to_f32_mono(raw)
        np.testing.assert_array_equal(out, raw.astype(np.float32) / 32768.0)

    def test_pcm16_stereo_mix(self):
        raw = RNG.integers(-32768, 32767, 2000).astype(np.int16)
        out = native.pcm16_to_f32_mono(raw, channels=2)
        want = (raw.astype(np.float32) / 32768.0).reshape(-1, 2).mean(axis=1)
        np.testing.assert_allclose(out, want, atol=1e-7)

    def test_pcm32(self):
        raw = RNG.integers(-(2**31), 2**31 - 1, 500).astype(np.int32)
        out = native.pcm32_to_f32_mono(raw)
        np.testing.assert_allclose(out, raw.astype(np.float64) / 2147483648.0, atol=1e-7)

    def test_mono_decode_bitwise_matches_stream_wrappers(self):
        """The mono PCM decode IS the stdin/serve hot path
        (match.py::_decode_samples routes int16/int32 through it), so the
        C fast path must match the numpy decode BITWISE — including
        full-scale int32 values whose f32 cast rounds past 2^24 (the
        double-product formulation differed by 1 ulp exactly there)."""
        from audio_pattern_detector_tpu.match import _SAMPLE_CODECS, _decode_samples

        edge16 = np.array([-32768, -32767, -1, 0, 1, 32766, 32767], dtype=np.int16)
        raw16 = np.concatenate(
            [edge16, RNG.integers(-32768, 32768, 4096).astype(np.int16)]
        )
        dt16, sc16 = _SAMPLE_CODECS[(1, 16)]
        want16 = (raw16.astype(np.float32) * np.float32(sc16)).astype(np.float32)
        np.testing.assert_array_equal(native.pcm16_to_f32_mono(raw16), want16)
        np.testing.assert_array_equal(
            _decode_samples(raw16.tobytes(), dt16, sc16), want16
        )

        edge32 = np.array(
            [-(2**31), -(2**31) + 1, -1, 0, 1, 2**31 - 65, 2**31 - 1],
            dtype=np.int32,
        )
        raw32 = np.concatenate(
            [edge32, RNG.integers(-(2**31), 2**31 - 1, 4096).astype(np.int32)]
        )
        dt32, sc32 = _SAMPLE_CODECS[(1, 32)]
        want32 = (raw32.astype(np.float32) * np.float32(sc32)).astype(np.float32)
        np.testing.assert_array_equal(native.pcm32_to_f32_mono(raw32), want32)
        np.testing.assert_array_equal(
            _decode_samples(raw32.tobytes(), dt32, sc32), want32
        )


def test_resample_is_exact_host_path():
    # resample routes to the exact numpy implementation regardless of the
    # native library (FFT ops live on device / numpy by design).
    x = RNG.standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(native.resample(x, 313), hostref.resample(x, 313))
