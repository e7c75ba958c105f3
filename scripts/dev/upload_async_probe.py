"""Is h2d upload host-blocking on this runtime, and does device_put help?

The round-4 ablations showed the batch loop's upload timer costs
~1.5-2 ms/chunk host-blocking PLUS ~2.6 ms/chunk device-stream
occupancy. If `jnp.asarray` blocks the host until the payload lands but
`jax.device_put` merely enqueues, switching the dispatch upload would
hide the host-blocking portion behind the next batch's section
assembly. This probe times, for a production-size payload (960 KB —
one 60 s chunk of int16-packed samples, 480000 int16) and a B=16 batch
(15 MB):

  asarray_call    - jnp.asarray() call-return time
  asarray_block   - ...then .block_until_ready() (total landing time)
  device_put_call - jax.device_put() call-return time
  device_put_block- ...then block (total)

Every timed call uploads a FRESH random payload never sent before (the
tunnel runtime memoises by input values, docs/scaling.md rule 10 —
reusing buffers across the four measurement series would time cache
hits); payload generation happens up front, outside the timers.

If *_call << *_block for either API, the upload is async at the call
site and the dispatch path can exploit it; if call ≈ block, the h2d RPC
is synchronous and the upload cost is a runtime floor.

Run on TPU: python scripts/dev/upload_async_probe.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

import jax

N_TIMED = 20
SAMPLES_PER_CHUNK = 480000  # 60 s at 8 kHz, int16 (960 KB)


def timeit(fn, payloads):
    samples = []
    for buf in payloads:
        t0 = time.perf_counter()
        fn(buf)
        samples.append(1e3 * (time.perf_counter() - t0))
    return round(statistics.median(samples[2:]), 2)


def main() -> None:
    rng = np.random.default_rng(0)

    def fresh(rows: int) -> list:
        # One distinct payload per timed call per measurement series.
        return [
            rng.integers(-1000, 1000, (rows, SAMPLES_PER_CHUNK), dtype=np.int16)
            .view(np.float32)
            for _ in range(N_TIMED)
        ]

    out = {"platform": jax.devices()[0].platform}
    for label, rows in (("chunk", 1), ("batch16", 16)):
        out[f"{label}_asarray_call_ms"] = timeit(
            lambda b: jax.numpy.asarray(b), fresh(rows)
        )
        out[f"{label}_asarray_block_ms"] = timeit(
            lambda b: jax.numpy.asarray(b).block_until_ready(), fresh(rows)
        )
        out[f"{label}_device_put_call_ms"] = timeit(
            lambda b: jax.device_put(b), fresh(rows)
        )
        out[f"{label}_device_put_block_ms"] = timeit(
            lambda b: jax.device_put(b).block_until_ready(), fresh(rows)
        )
        print(f"{label}: {out}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
