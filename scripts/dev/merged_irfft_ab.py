"""Same-process order-alternating A/B: merged-irfft geometry under scan batching.

Round 3 measured the merged irfft (ONE inverse transform for all groups
of a class, bank_correlate_multi) a streaming-step LOSS (+2.6 ms on the
corr rung). VERDICT r4 #4 asked for a re-test under the now-DEFAULT
scan-batch schedule: the merged geometry composes with the Pallas lean
path (ops/correlate.py::bank_correlate_abs_multi) and is a STATIC
program variant (bank._merged → jit static arg), so both variants
compile once and alternate windows cleanly (harness: _scanbatch_ab.py).

MEASURED (2026-08-21, on-chip): median +1.9% but sign-INCONSISTENT
across windows (later windows −2.4/−5.0%) — noise-level; stays off.

Run on TPU: python scripts/dev/merged_irfft_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _scanbatch_ab import run_scan_batch_ab


def _set(bank, on: bool) -> None:
    bank._merged = on


if __name__ == "__main__":
    run_scan_batch_ab("merged", _set)
