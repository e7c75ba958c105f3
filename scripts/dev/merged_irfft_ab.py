"""Same-process order-alternating A/B: merged-irfft geometry under scan batching.

Round 3 measured the merged irfft (ONE inverse transform for all groups
of a class, bank_correlate_multi) a streaming-step LOSS (+2.6 ms on the
corr rung) — the backend FFT's cost is linear in rows with only a small
per-op intercept, so merging saves the intercept but changed the fusion
picture for the worse. VERDICT r4 #4 asks for a re-test under the now-
DEFAULT scan-batch schedule (launches amortised, Pallas candidate scan
on): the merged geometry now composes with the Pallas lean path
(ops/correlate.py::bank_correlate_abs_multi) and is a STATIC program
variant (bank._merged -> jit static arg), so both variants compile once
and alternate windows cleanly.

Run on TPU: python scripts/dev/merged_irfft_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import numpy as np

import jax

from __graft_entry__ import _make_bank

SR = 8000
CHUNK_S = 60
WINDOWS = int(os.environ.get("APD_PROBE_WINDOWS", "5"))
SCAN_B = int(os.environ.get("APD_PROBE_B", "16"))


def main() -> None:
    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=CHUNK_S)
    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=CHUNK_S)
    det._bank = bank

    rng = np.random.default_rng(7)
    raw = [0.05 * rng.standard_normal(CHUNK_S * SR) for _ in range(4)]
    # Real hits so the identity gate covers the verify/greedy path.
    normal = clips[0].audio
    marker = clips[-1].audio
    raw[0][3 * SR : 3 * SR + len(normal)] += normal
    raw[1][11 * SR : 11 * SR + len(marker)] += 0.8 * marker
    ci16 = [
        np.clip(np.round(np.asarray(c) * 32768), -32768, 32767).astype(np.int16)
        for c in raw
    ]
    audio = np.concatenate([ci16[i % 4] for i in range(SCAN_B * 2)])

    # Warm + correctness gate for both variants (merged is a static jit
    # arg: each compiles once, results must be identical).
    bank._merged = False
    r_base = det.find_clip_in_array(audio, batch_size=SCAN_B)
    n_hits = sum(len(v) for v in r_base[0].values())
    assert n_hits > 0, "probe audio must carry real detections"
    bank._merged = True
    r_merged = det.find_clip_in_array(audio, batch_size=SCAN_B)
    assert r_merged == r_base, "merged-irfft results diverge"
    print(f"identity gate: {n_hits} detections, equal", file=sys.stderr)

    def window(merged: bool) -> float:
        bank._merged = merged
        t0 = time.perf_counter()
        det.find_clip_in_array(audio, batch_size=SCAN_B)
        return (len(audio) / SR) / (time.perf_counter() - t0)

    fa, fb = [], []
    for w in range(WINDOWS):
        first, second = (False, True) if w % 2 == 0 else (True, False)
        x1, x2 = window(first), window(second)
        (fa if not first else fb).append(x1)
        (fb if not first else fa).append(x2)
        print(f"[w{w}] base {fa[-1]:.0f}x  merged {fb[-1]:.0f}x", file=sys.stderr)
    out = {
        "platform": jax.devices()[0].platform,
        "scan_b": SCAN_B,
        "base_x": round(statistics.median(fa), 1),
        "merged_x": round(statistics.median(fb), 1),
        "speedup_pct": round(
            100 * (statistics.median(fb) / statistics.median(fa) - 1), 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
