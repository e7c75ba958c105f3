"""Run the REFERENCE CLI with its native dependencies shimmed by this
repo's exact host implementations.

The reference (`andrewtheguy/audio_pattern_detector`) needs three packages
that cannot be installed in this environment (no rustc for the
native-helper crate, no egress for the `fft-correlation` abi3 wheel or the
`andrew-utils` pip package):

  * ``audio_pattern_detector._native``  (Rust/PyO3 numerics)
  * ``fft_correlation.fft_correlate_1d`` (separate compiled package)
  * ``andrew_utils.seconds_to_time``     (timestamp formatter)

Each is replaced here by this repo's host anchor with the same contract:
``ops/hostref.py`` re-derives every native numeric from its public
definition (BS.1770, scipy find_peaks/resample semantics, f64 Pearson) and
is differentially pinned against scipy in ``tests/test_ops_hostref.py``;
``utils/timefmt.seconds_to_time`` reimplements the formatter (the one
shimmed symbol with no independent ground truth available offline — see
docs/reference-parity.md).

With the shims installed, every line of the reference's own Python —
engine, verifiers, wrappers, JSONL emitters — runs unmodified, so
diffing the two CLIs' stdout byte-for-byte (tests/test_reference_diff.py)
checks the full behavioural surface, not hand-copied golden constants.

Usage:  python scripts/run_reference_cli.py [REFERENCE_DIR] -- <cli args...>
        (REFERENCE_DIR defaults to $APD_REFERENCE_DIR or /root/reference)
"""

from __future__ import annotations

import os
import sys
import types


def install_shims(repo_root: str) -> None:
    """Pre-seed sys.modules so the reference package imports resolve to
    this repo's exact host implementations."""
    sys.path.insert(0, repo_root)
    from audio_pattern_detector_tpu.ops import hostref
    from audio_pattern_detector_tpu.utils.timefmt import seconds_to_time

    fc = types.ModuleType("fft_correlation")
    fc.fft_correlate_1d = hostref.fft_correlate_1d  # type: ignore[attr-defined]
    sys.modules["fft_correlation"] = fc

    au = types.ModuleType("andrew_utils")
    au.seconds_to_time = seconds_to_time  # type: ignore[attr-defined]
    sys.modules["andrew_utils"] = au

    nat = types.ModuleType("audio_pattern_detector._native")
    for name in (
        "find_peaks",
        "resample",
        "resample_preserve_maxima",
        "simpson",
        "integrated_loudness",
        "loudness_normalize",
        "pearson_correlation",
    ):
        setattr(nat, name, getattr(hostref, name))
    # Seeding the submodule entry before the package import wins: the
    # `from audio_pattern_detector._native import X` machinery checks
    # sys.modules for the dotted name first.
    sys.modules["audio_pattern_detector._native"] = nat


def main() -> None:
    argv = sys.argv[1:]
    if "--" in argv:
        split = argv.index("--")
        head, cli_args = argv[:split], argv[split + 1 :]
    else:
        head, cli_args = [], argv
    reference_dir = (
        head[0]
        if head
        else os.environ.get("APD_REFERENCE_DIR", "/root/reference")
    )
    if not os.path.isdir(os.path.join(reference_dir, "audio_pattern_detector")):
        raise SystemExit(
            f"reference package not found under {reference_dir!r}"
        )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    install_shims(repo_root)
    sys.path.insert(0, reference_dir)

    from audio_pattern_detector.cli import main as reference_main

    sys.argv = ["audio-pattern-detector", *cli_args]
    reference_main()


if __name__ == "__main__":
    main()
