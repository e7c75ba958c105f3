"""Throughput benchmark: audio-hours scanned per second per chip.

Flagship configuration from BASELINE.md: 8 kHz mono audio scanned against a
64-clip bank (32 normal 1 s clips + 32 marker tones) on one chip. Reports
the realtime factor (seconds of audio processed per wall-clock second) in
steady state, including host->device transfer and host-side result
conversion, excluding compilation (warmup chunks).

Prints exactly one JSON line:
  {"metric": "realtime_factor_64clip", "value": N, "unit": "x_realtime",
   "vs_baseline": N/1000}
(baseline: the >=1000x realtime target from BASELINE.md; the reference CPU
implementation publishes no throughput numbers.)

The run executes in a child process and retries on backend errors: the
single-chip tunnel used here intermittently fails programs with
UNIMPLEMENTED and poisons the failing process, so a fresh process per
attempt is the only reliable retry.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> None:
    from __graft_entry__ import _make_bank

    sr = 8000
    chunk_seconds = 60
    bank, _ = _make_bank(num_normal=32, num_marker=32, chunk_seconds=chunk_seconds)

    import numpy as np

    rng = np.random.default_rng(7)
    n_distinct = 4
    chunks = [
        (0.05 * rng.standard_normal(chunk_seconds * sr)).astype(np.float32)
        for _ in range(n_distinct)
    ]

    # Warmup: compile + first execution.
    prev = None
    for i in range(2):
        bank.process_chunk(chunks[i % n_distinct], prev)
        prev = chunks[i % n_distinct]

    # Steady state.
    n_iters = 20
    t0 = time.perf_counter()
    detections = 0
    for i in range(n_iters):
        chunk = chunks[i % n_distinct]
        out = bank.process_chunk(chunk, prev)
        detections += sum(len(v) for v in out.values())
        prev = chunk
    elapsed = time.perf_counter() - t0

    audio_seconds = n_iters * chunk_seconds
    realtime_factor = audio_seconds / elapsed
    print(
        f"[bench] {n_iters} chunks x {chunk_seconds}s, 64-clip bank: "
        f"{elapsed:.3f}s wall, {realtime_factor:.0f}x realtime, "
        f"{detections} detections",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "realtime_factor_64clip",
                "value": round(realtime_factor, 1),
                "unit": "x_realtime",
                "vs_baseline": round(realtime_factor / 1000.0, 3),
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("APD_BENCH_INNER") == "1":
        run_bench()
        return
    env = dict(os.environ, APD_BENCH_INNER="1")
    attempts = 4
    for attempt in range(1, attempts + 1):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
        )
        sys.stderr.write(r.stderr)
        line = next(
            (ln for ln in r.stdout.splitlines() if ln.startswith("{")), None
        )
        if r.returncode == 0 and line:
            print(line, flush=True)
            return
        print(
            f"[bench] attempt {attempt}/{attempts} failed "
            f"(rc={r.returncode}); retrying in a fresh process",
            file=sys.stderr,
        )
        time.sleep(180)  # degraded-tunnel windows last minutes
    print(
        json.dumps(
            {
                "metric": "realtime_factor_64clip",
                "value": 0.0,
                "unit": "x_realtime",
                "vs_baseline": 0.0,
                "error": "backend failure after retries",
            }
        ),
        flush=True,
    )
    sys.exit(1)


if __name__ == "__main__":
    main()
