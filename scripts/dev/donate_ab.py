"""Same-process order-alternating A/B: payload buffer donation (scan batch).

VERDICT r4 #4's third lever: donate the uploaded (B, S) payload to the
batch program (donate_argnums=(0,)) so XLA may alias its HBM buffer for
outputs. Donation is a compile-time property, so the donating program
is a separate executable (models/bank.py::_DONATING_JITS) selected by
``bank._donate`` — both variants compile once and alternate windows
cleanly (harness: _scanbatch_ab.py).

MEASURED (2026-08-21, on-chip): structural NO-OP — XLA warns "Some
donated buffers were not usable" (the tiny decision payload cannot
alias the (B, S) input); the A/B's apparent ±6% is window noise around
an identical executable. Stays off.

Run on TPU: python scripts/dev/donate_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _scanbatch_ab import run_scan_batch_ab


def _set(bank, on: bool) -> None:
    bank._donate = on


if __name__ == "__main__":
    run_scan_batch_ab("donate", _set)
