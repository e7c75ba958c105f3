"""Interactive QA: speed + exactness of the native/host numerics.

Parity with the reference's QA harness
(reference: native-helper/scripts/compare_find_peaks.py:47-109 and
compare_loudness.py): median-of-N wall-clock comparison and exactness
diagnostics across the three host implementations of each kernel —
scipy/pyloudnorm-style reference (scipy, dev-only), the C++ runtime
(csrc/apd_native.cpp via ctypes), and the pure-numpy exact anchor
(ops/hostref.py).

Usage:
  python scripts/compare_native.py find-peaks [--n 500000] [--height 0.25]
         [--distance 8000] [--prominence 0.05] [--repeat 7]
  python scripts/compare_native.py loudness [--seconds 60] [--repeat 7]
  python scripts/compare_native.py pearson [--n 505] [--repeat 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, repeat: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _report(name: str, medians: dict[str, float]) -> None:
    base = medians.get("scipy") or next(iter(medians.values()))
    for impl, med in medians.items():
        speedup = base / med if med > 0 else float("inf")
        print(f"{name}:{impl}_median_sec={med:.6f} speedup_vs_ref={speedup:.2f}x")


def cmd_find_peaks(args: argparse.Namespace) -> None:
    from audio_pattern_detector_tpu import native
    from audio_pattern_detector_tpu.ops import hostref

    rng = np.random.default_rng(0)
    signal = rng.standard_normal(args.n).astype(np.float32)
    kwargs = {}
    if args.height is not None:
        kwargs["height"] = args.height
    if args.distance is not None:
        kwargs["distance"] = args.distance
    if args.prominence is not None:
        kwargs["prominence"] = args.prominence

    impls = {"hostref": lambda: hostref.find_peaks(signal, **kwargs)[0]}
    if native.native_available():
        impls["native"] = lambda: native.find_peaks(signal, **kwargs)[0]
    try:
        import scipy.signal

        impls["scipy"] = lambda: scipy.signal.find_peaks(signal, **kwargs)[0]
    except ImportError:
        print("scipy unavailable; comparing native vs hostref only")

    results = {name: fn() for name, fn in impls.items()}
    ref_name = "scipy" if "scipy" in results else "hostref"
    ref = results[ref_name]
    print(f"signal_len={len(signal)} params={kwargs}")
    for name, peaks in results.items():
        exact = np.array_equal(np.asarray(peaks), np.asarray(ref))
        print(f"{name}_count={len(peaks)} exact_vs_{ref_name}={exact}")
        if not exact:
            only_ref = np.setdiff1d(ref, peaks)
            only_impl = np.setdiff1d(peaks, ref)
            print(f"  only_{ref_name}={len(only_ref)} only_{name}={len(only_impl)}")

    _report(
        "find_peaks",
        {n: _median_time(fn, args.repeat) for n, fn in impls.items()},
    )


def cmd_loudness(args: argparse.Namespace) -> None:
    from audio_pattern_detector_tpu import native
    from audio_pattern_detector_tpu.ops import hostref

    sr = 8000
    rng = np.random.default_rng(1)
    signal = (0.3 * rng.standard_normal(args.seconds * sr)).astype(np.float32)

    impls = {"hostref": lambda: hostref.integrated_loudness(signal, sr)}
    if native.native_available():
        impls["native"] = lambda: native.integrated_loudness(signal, sr)
    try:
        import pyloudnorm  # noqa: F401 — optional, reference QA dep

        meter = pyloudnorm.Meter(sr)
        impls["pyloudnorm"] = lambda: meter.integrated_loudness(
            signal.astype(np.float64)
        )
    except ImportError:
        pass

    values = {name: fn() for name, fn in impls.items()}
    print(f"signal_seconds={args.seconds}")
    ref_name = "pyloudnorm" if "pyloudnorm" in values else "hostref"
    for name, v in values.items():
        print(
            f"{name}_lufs={v:.9f} delta_vs_{ref_name}={abs(v - values[ref_name]):.2e}"
        )
    _report(
        "loudness",
        {n: _median_time(fn, args.repeat) for n, fn in impls.items()},
    )


def cmd_pearson(args: argparse.Namespace) -> None:
    from audio_pattern_detector_tpu import native
    from audio_pattern_detector_tpu.ops import hostref

    rng = np.random.default_rng(2)
    x = rng.standard_normal(args.n).astype(np.float32)
    y = (x + 0.3 * rng.standard_normal(args.n)).astype(np.float32)

    impls = {"hostref": lambda: hostref.pearson_correlation(x, y)}
    if native.native_available():
        impls["native"] = lambda: native.pearson_correlation(x, y)
    try:
        import scipy.stats

        impls["scipy"] = lambda: float(scipy.stats.pearsonr(x, y).statistic)
    except ImportError:
        pass

    values = {name: fn() for name, fn in impls.items()}
    ref_name = "scipy" if "scipy" in values else "hostref"
    for name, v in values.items():
        print(f"{name}_r={v:.12f} delta_vs_{ref_name}={abs(v - values[ref_name]):.2e}")
    _report(
        "pearson",
        {n: _median_time(fn, args.repeat) for n, fn in impls.items()},
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    fp = sub.add_parser("find-peaks")
    fp.add_argument("--n", type=int, default=500_000)
    fp.add_argument("--height", type=float, default=0.25)
    fp.add_argument("--distance", type=int, default=8000)
    fp.add_argument("--prominence", type=float, default=None)
    fp.add_argument("--repeat", type=int, default=7)
    fp.set_defaults(fn=cmd_find_peaks)

    ld = sub.add_parser("loudness")
    ld.add_argument("--seconds", type=int, default=60)
    ld.add_argument("--repeat", type=int, default=7)
    ld.set_defaults(fn=cmd_loudness)

    pr = sub.add_parser("pearson")
    pr.add_argument("--n", type=int, default=505)
    pr.add_argument("--repeat", type=int, default=7)
    pr.set_defaults(fn=cmd_pearson)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
