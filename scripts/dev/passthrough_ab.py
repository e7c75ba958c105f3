"""Same-process order-alternating A/B: int16 passthrough vs f32 chunks.

Round 4 plumbs raw int16 from the WAV/stdin wrappers to the device
(models/bank.py section assembly bit-packs with a view instead of the
native quantise+check pass). This probe measures the streaming loop
(depth-3 pipeline, the live default) and the scan-batch offline loop
with IDENTICAL samples fed as f32-on-the-PCM-grid (the old wrapper
output) vs raw int16 (the new passthrough), alternating A/B windows in
one process so tunnel drift cancels to first order (same protocol as
pallas_stream_ab.py). Results are asserted identical each window.

Run on TPU: python scripts/dev/passthrough_ab.py
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
from bench import _pipelined_loop

SR = 8000
CHUNK_S = 60
N_DISTINCT = 4
WINDOWS = int(os.environ.get("APD_PROBE_WINDOWS", "5"))
ITERS = int(os.environ.get("APD_PROBE_ITERS", "10"))


def main() -> None:
    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=CHUNK_S)
    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=CHUNK_S)
    det._bank = bank

    rng = np.random.default_rng(7)
    cf32 = [
        (
            np.clip(
                np.round(0.05 * rng.standard_normal(CHUNK_S * SR) * 32768),
                -32768,
                32767,
            )
            / np.float32(32768.0)
        ).astype(np.float32)
        for _ in range(N_DISTINCT)
    ]
    ci16 = [(c * np.float32(32768.0)).astype(np.int16) for c in cf32]

    # Warm both program paths (identical programs — warm transfers/caches).
    prev = None
    for i in range(2):
        a = bank.process_chunk(cf32[i % N_DISTINCT], prev)
        prev = cf32[i % N_DISTINCT]
    prev = None
    for i in range(2):
        b = bank.process_chunk(ci16[i % N_DISTINCT], prev)
        prev = ci16[i % N_DISTINCT]
    assert a == b, "int16 vs f32 results diverge"

    def stream_window(chunks) -> float:
        elapsed, _d, _p = _pipelined_loop(
            bank, lambda i: chunks[i % N_DISTINCT], ITERS, None, 3
        )
        return ITERS * CHUNK_S / elapsed

    scan_b = 16
    la32 = np.concatenate([cf32[i % N_DISTINCT] for i in range(scan_b * 2)])
    la16 = np.concatenate([ci16[i % N_DISTINCT] for i in range(scan_b * 2)])
    r32 = det.find_clip_in_array(la32, batch_size=scan_b)
    r16 = det.find_clip_in_array(la16, batch_size=scan_b)
    assert r16 == r32, "offline int16 vs f32 results diverge"

    def scan_window(audio) -> float:
        t0 = time.perf_counter()
        det.find_clip_in_array(audio, batch_size=scan_b)
        return (len(audio) / SR) / (time.perf_counter() - t0)

    out: dict = {"platform": jax.devices()[0].platform, "windows": WINDOWS}
    for name, fn_a, fn_b in (
        ("stream", lambda: stream_window(cf32), lambda: stream_window(ci16)),
        ("scan16", lambda: scan_window(la32), lambda: scan_window(la16)),
    ):
        fa, fb = [], []
        for w in range(WINDOWS):
            # Alternate order each window so drift cancels.
            first, second = (fn_a, fn_b) if w % 2 == 0 else (fn_b, fn_a)
            x1, x2 = first(), second()
            (fa if w % 2 == 0 else fb).append(x1)
            (fb if w % 2 == 0 else fa).append(x2)
            print(
                f"[{name} w{w}] f32 {fa[-1]:.0f}x  int16 {fb[-1]:.0f}x",
                file=sys.stderr,
            )
        med_a, med_b = statistics.median(fa), statistics.median(fb)
        out[f"{name}_f32_x"] = round(med_a, 1)
        out[f"{name}_i16_x"] = round(med_b, 1)
        out[f"{name}_speedup_pct"] = round(100 * (med_b / med_a - 1), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
