"""Same-process order-alternating A/B: Pallas candidate scan in SCAN-BATCH mode.

Round 3 closed the Pallas question for the STREAMING loop: the single-
pass candidate-scan kernel wins the device step (6.1 -> 2.2 ms mask
stage) but measured ~-1.5% end-to-end, so it stayed opt-in. Round 4's
ablations changed the frame: batch modes are now the throughput path,
their host time is fully additive, and scan-batch amortises launches —
so a step win SHOULD surface e2e here if the round-3 loss was per-launch
overhead. Measured +5.2% (2026-08-21), which made pallas the BATCH
dispatch default on TPU; this probe A/Bs find_clip_in_array (scan,
B=16) with bank._pallas_batch toggled between alternating windows (the
pallas flag is a static jit arg — both variants compile once, results
asserted equal).

Run on TPU: python scripts/dev/pallas_scanbatch_ab.py
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
    # Embed real hits (a normal clip and a marker tone) so the identity
    # assertion covers the verify/greedy-survivor path under the kernel,
    # not just noise-only candidate counting (advisor round 4).
    normal = clips[0].audio
    marker = clips[-1].audio
    raw[0][3 * SR : 3 * SR + len(normal)] += normal
    raw[1][11 * SR : 11 * SR + len(marker)] += 0.8 * marker
    raw[2][40 * SR : 40 * SR + len(normal)] += normal
    ci16 = [
        np.clip(np.round(np.asarray(c) * 32768), -32768, 32767).astype(
            np.int16
        )
        for c in raw
    ]
    audio = np.concatenate([ci16[i % 4] for i in range(SCAN_B * 2)])

    # Warm + correctness gate for both variants.
    bank._pallas_batch = False
    r_base = det.find_clip_in_array(audio, batch_size=SCAN_B)
    n_hits = sum(len(v) for v in r_base[0].values())
    assert n_hits > 0, "probe audio must carry real detections"
    try:
        bank._pallas_batch = True
        r_pallas = det.find_clip_in_array(audio, batch_size=SCAN_B)
    except Exception as e:  # noqa: BLE001 — report, don't crash the probe
        print(json.dumps({"error": f"pallas scan-batch failed: {e!r}"}))
        return
    assert r_pallas == r_base, "pallas scan-batch results diverge"
    print(f"identity gate: {n_hits} detections, equal", file=sys.stderr)

    def window(pallas: bool) -> float:
        bank._pallas_batch = pallas
        t0 = time.perf_counter()
        det.find_clip_in_array(audio, batch_size=SCAN_B)
        return (len(audio) / SR) / (time.perf_counter() - t0)

    fa, fb = [], []
    for w in range(WINDOWS):
        first, second = (False, True) if w % 2 == 0 else (True, False)
        x1, x2 = window(first), window(second)
        (fa if not first else fb).append(x1)
        (fb if not first else fa).append(x2)
        print(f"[w{w}] base {fa[-1]:.0f}x  pallas {fb[-1]:.0f}x", file=sys.stderr)
    out = {
        "platform": jax.devices()[0].platform,
        "scan_b": SCAN_B,
        "base_x": round(statistics.median(fa), 1),
        "pallas_x": round(statistics.median(fb), 1),
        "speedup_pct": round(
            100 * (statistics.median(fb) / statistics.median(fa) - 1), 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
