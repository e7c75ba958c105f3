"""Shared harness for same-process order-alternating scan-batch A/Bs.

Builds the flagship 64-clip bank, hit-bearing int16 probe audio (real
normal + marker detections so the identity gate covers the verify /
greedy path), asserts both variants' results identical, then alternates
measurement windows with the variant order flipped each window —
cancelling the shared chip's window drift by construction
(docs/scaling.md measurement protocol). The variant under test must be
a STATIC program property togglable on the live bank (e.g. a static jit
arg like ``bank._merged`` / ``bank._donate``) so both executables
compile once up front.
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

SR = 8000
CHUNK_S = 60
WINDOWS = int(os.environ.get("APD_PROBE_WINDOWS", "5"))
SCAN_B = int(os.environ.get("APD_PROBE_B", "16"))


def run_scan_batch_ab(variant_name: str, set_variant) -> None:
    """A/B ``find_clip_in_array`` (scan, B=SCAN_B) with
    ``set_variant(bank, on: bool)`` toggling the program variant."""
    import jax

    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=CHUNK_S)
    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=CHUNK_S)
    det._bank = bank

    rng = np.random.default_rng(7)
    raw = [0.05 * rng.standard_normal(CHUNK_S * SR) for _ in range(4)]
    normal = clips[0].audio
    marker = clips[-1].audio
    raw[0][3 * SR : 3 * SR + len(normal)] += normal
    raw[1][11 * SR : 11 * SR + len(marker)] += 0.8 * marker
    ci16 = [
        np.clip(np.round(np.asarray(c) * 32768), -32768, 32767).astype(np.int16)
        for c in raw
    ]
    audio = np.concatenate([ci16[i % 4] for i in range(SCAN_B * 2)])

    # Warm + correctness gate for both variants.
    set_variant(bank, False)
    r_base = det.find_clip_in_array(audio, batch_size=SCAN_B)
    n_hits = sum(len(v) for v in r_base[0].values())
    assert n_hits > 0, "probe audio must carry real detections"
    set_variant(bank, True)
    r_var = det.find_clip_in_array(audio, batch_size=SCAN_B)
    assert r_var == r_base, f"{variant_name} results diverge"
    print(f"identity gate: {n_hits} detections, equal", file=sys.stderr)

    def window(on: bool) -> float:
        set_variant(bank, on)
        t0 = time.perf_counter()
        det.find_clip_in_array(audio, batch_size=SCAN_B)
        return (len(audio) / SR) / (time.perf_counter() - t0)

    fa, fb = [], []
    for w in range(WINDOWS):
        first, second = (False, True) if w % 2 == 0 else (True, False)
        x1, x2 = window(first), window(second)
        (fa if not first else fb).append(x1)
        (fb if not first else fa).append(x2)
        print(
            f"[w{w}] base {fa[-1]:.0f}x  {variant_name} {fb[-1]:.0f}x",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "scan_b": SCAN_B,
                "base_x": round(statistics.median(fa), 1),
                f"{variant_name}_x": round(statistics.median(fb), 1),
                "speedup_pct": round(
                    100 * (statistics.median(fb) / statistics.median(fa) - 1),
                    1,
                ),
            }
        )
    )
