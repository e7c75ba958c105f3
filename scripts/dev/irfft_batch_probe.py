"""irfft batch scaling: per-op fixed cost or linear in rows?

VERDICT r2 #1 follow-up. The step_decompose ladder at 60/120/240/480 s
chunks shows the corr stage growing super-linearly in chunk length
(10.8 / 22.3 / 68.4 / 133.6 ms marginal), contradicting the round-1/2
floor model's "per-op fixed FFT cost nearly independent of batch". This
probe isolates the irfft op at the production shape (rows x 32768, c64
spectra in, rows = G * num_segments at the class geometry) across the
four chunk sizes' row counts.

Methodology notes (all three bit this probe before settling):
  * Baked closure constants at these shapes blow the tunnel's
    compile-payload limit (HTTP 413 at 2496 x 16385 c64).
  * Same-valued argument buffers get memoised by the runtime (0.02 ms
    "executions"), and a token chain whose value converges to a fixed
    point (out = sum * 1e-12 style) degenerates to the same thing.
  * So: spectra are generated IN-GRAPH from a token that ADVANCES by
    +1.0 every call (never value-identical), and the first repeat is
    discarded (warm-path cache effects made rep0 read 0.06 ms once).
  * The memoisation cache is SERVER-SIDE, keyed on (program, input
    values), and survives the client process: replaying a token
    sequence — across runs OR across repeats within one run — reads
    ~0.03 ms per "execution". Program outputs here are scalars, so
    every completed call is trivially cacheable. The protocol is
    therefore: wall-time salt + a token that NEVER repeats a value
    (it keeps advancing across repeats; repeats are medianed, and the
    very first measured repeat can still read ~0 when the enqueue
    pipeline hasn't back-pressured yet — medians absorb it).

Result (2026-08-19, TPU v5lite tunnel, never-reused tokens):
rows640 9.2 ms, rows1280 15.9 ms, rows2496 28.0 ms, rows4960 52.0 ms
-> marginal 10.5 / 9.95 / 9.7 us/row, fixed intercept ~2.5 ms/op.
LINEAR in rows; no batch regime cliff in the op itself.

Result (2026-08-19, TPU v5lite tunnel): linear, ~9.7 us/row across
640 -> 4960 rows (gen included; marginals 9.5 / 10.0 / 9.7 us/row
between consecutive rungs). No fixed per-op floor, no batch regime
cliff. The corr stage is therefore linear in chunk seconds, and the
big-chunk launch-amortisation model is wrong — see docs/scaling.md.

Run: python scripts/dev/irfft_batch_probe.py
Writes bench_results/irfft_batch_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "bench_results",
    ".jax_cache",
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("APD_PROBE_ITERS", "6"))
REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))
N = 32768  # production fft_len (class-shared geometry, 64-clip flagship)
NF = N // 2 + 1

# rows = G * num_segments at the class geometry (G=32/group, step=24769):
# 60 s -> 640, 120 s -> 1280, 240 s -> 2496, 480 s -> 4960
ROW_CASES = (640, 1280, 2496, 4960)


@partial(jax.jit, static_argnums=(1,))
def step(token, rows):
    x = jax.lax.iota(jnp.float32, rows * NF).reshape(rows, NF)
    re = jnp.sin(x * jnp.float32(0.1031) + token * jnp.float32(0.001))
    im = jnp.cos(x * jnp.float32(0.0717) + token * jnp.float32(0.0013))
    spec = jax.lax.complex(re, im)
    y = jnp.fft.irfft(spec, n=N, axis=1)
    # token advances by ~1 every call -> calls are never value-identical
    return (
        token
        + jnp.float32(1.0)
        + jnp.sum(jnp.abs(y[:, ::4096])) * jnp.float32(1e-9)
    )


def main() -> None:
    salt = float(int(time.time()) % 86400)
    results: dict[str, dict] = {}
    prev = None
    for rows in ROW_CASES:
        t = jnp.float32(salt)
        _ = float(step(t, rows))  # compile + warm
        reps = []
        for rep in range(REPEATS + 1):  # rep0 discarded (enqueue pipeline)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                t = step(t, rows)  # token keeps advancing: never replayed
            # block_until_ready can return before the chain executes on
            # this backend; a host value fetch is the only reliable sync.
            tv = float(t)
            reps.append((time.perf_counter() - t0) / ITERS)
        salt = tv + 100.0
        ms = float(np.median(reps[1:])) * 1e3
        entry = {
            "rows": rows,
            "ms": round(ms, 2),
            "us_per_row": round(ms * 1e3 / rows, 2),
        }
        if prev is not None:
            entry["marginal_us_per_row"] = round(
                (ms - prev[1]) * 1e3 / (rows - prev[0]), 2
            )
        results[f"rows{rows}"] = entry
        print(
            f"rows{rows:<6d} {ms:8.2f} ms   {entry['us_per_row']:6.2f} us/row"
            + (
                f"   marginal {entry['marginal_us_per_row']:6.2f} us/row"
                if prev is not None
                else ""
            ),
            flush=True,
        )
        prev = (rows, ms)

    out = {
        "platform": jax.devices()[0].platform,
        "iters": ITERS,
        "repeats": REPEATS,
        "fft_len": N,
        "results": results,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "bench_results",
        "irfft_batch_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["ms"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
