"""Does h2d upload overlap with device execution, or serialize behind it?

Round-5 serving decomposition: with staging-buffer pooling in place, the
`upload` stage still costs ~8 ms/row (~120 MB/s effective) inside
serving rounds — ~8× slower than the isolated h2d probe's 1-1.7 GB/s
(scripts/dev/upload_async_probe.py, idle device). Hypothesis: the
tunnel runtime serializes h2d RPCs with program execution on one
channel, so "upload time" during pipelined rounds is mostly *waiting
for the device stream*, not transfer. If true, serving is device-bound
and no host-side overlap trick can help; if false (uploads DO overlap),
a dispatcher thread could hide the upload cost.

Method: time the same fresh-payload upload (a) with the device idle,
(b) immediately after enqueueing a chain of long-running programs
(launches are async — the call returns while the device grinds). Fresh
random payloads per timed call (memoisation rule 10).

Run on TPU: python scripts/dev/h2d_overlap_probe.py
"""

from __future__ import annotations

import json
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp

ROWS, S = 16, 244000  # one serving tile payload (~15.6 MB f32)
N_TIMED = 8


def make_payloads(rng, n):
    return [
        rng.standard_normal((ROWS, S)).astype(np.float32) for _ in range(n)
    ]


def busy_program():
    # ~100 ms of device work: batched irfft chain at flagship-like shape.
    @jax.jit
    def f(x):
        for _ in range(6):
            x = jnp.fft.irfft(jnp.fft.rfft(x, axis=1), x.shape[1], axis=1)
        return x

    return f


def main() -> None:
    rng = np.random.default_rng(0)
    f = busy_program()
    warm = jnp.asarray(rng.standard_normal((1280, 32768)).astype(np.float32))
    jax.block_until_ready(f(warm))  # compile

    def timed_upload(buf):
        t0 = time.perf_counter()
        dev = jnp.asarray(buf)
        dt = time.perf_counter() - t0
        return dt, dev

    # (a) idle-device uploads
    idle = []
    for buf in make_payloads(rng, N_TIMED):
        dt, _ = timed_upload(buf)
        idle.append(1e3 * dt)

    # (b) uploads while the device grinds an async chain
    busy = []
    for buf in make_payloads(rng, N_TIMED):
        x = jnp.asarray(rng.standard_normal((1280, 32768)).astype(np.float32))
        outs = [f(x) for _ in range(3)]  # ~300 ms enqueued, calls return
        dt, _ = timed_upload(buf)
        busy.append(1e3 * dt)
        jax.block_until_ready(outs)  # drain before next iteration

    out = {
        "platform": jax.devices()[0].platform,
        "payload_mb": round(ROWS * S * 4 / 1e6, 1),
        "idle_ms": round(statistics.median(idle[1:]), 2),
        "busy_ms": round(statistics.median(busy[1:]), 2),
        "idle_all": [round(v, 1) for v in idle],
        "busy_all": [round(v, 1) for v in busy],
        "serializes": statistics.median(busy[1:])
        > 3 * statistics.median(idle[1:]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
