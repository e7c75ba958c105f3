"""Sweep overlap-save FFT sizes for the flagship correlate stage.

For each candidate segment size N, times (dependency-chained, same
process/window): rfft over the (ns, N) section segments + irfft over the
(G, ns, N) spectra products per group — the two FFT ops of the correlate
stage — plus the elementwise product pass. Reports seconds per chunk for
G=32 x 2 groups, m_max=8000, S=488000.

Run in a healthy window: python scripts/dev/fft_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("APD_PROBE_ITERS", "8"))
REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))
S, M, G, GROUPS = 488000, 8000, 32, 2


def _delta(token):
    return jnp.where(jnp.isnan(token), 1.0, 0.0)


def chained(step):
    tok = jax.block_until_ready(step(jnp.float32(0.0)))
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        t = tok
        for _ in range(ITERS):
            t = step(t)
        jax.block_until_ready(t)
        samples.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(samples))


def main() -> None:
    rng = np.random.default_rng(0)
    out = {"platform": jax.devices()[0].platform, "sweep": {}}
    sec = jnp.asarray(rng.standard_normal(S).astype(np.float32))

    for N in (16384, 32768, 65536, 131072, 262144, 524288):
        step_len = N - M + 1
        ns = -(-(S + M - 1) // step_len)
        nf = N // 2 + 1
        re = jnp.asarray(
            rng.standard_normal((G, nf)).astype(np.float32)
        )
        im = jnp.asarray(
            rng.standard_normal((G, nf)).astype(np.float32)
        )

        @jax.jit
        def full_chain(token, N=N, ns=ns, step_len=step_len, re=re, im=im):
            s = sec + _delta(token)
            padded = jnp.pad(s, (M - 1, ns * step_len + N - (S + M - 1)))
            segs = jnp.stack(
                [
                    jax.lax.dynamic_slice(padded, (i * step_len,), (N,))
                    for i in range(ns)
                ]
            )
            spec = jnp.fft.rfft(segs, axis=1)  # (ns, nf)
            bank = re + 1j * im  # (G, nf)
            acc = jnp.float32(0.0)
            for _g in range(GROUPS):
                y = jnp.fft.irfft(
                    spec[None, :, :] * bank[:, None, :], n=N, axis=2
                )
                acc = acc + jnp.sum(jnp.abs(y[:, :, :step_len]))
            return acc

        try:
            t = chained(full_chain)
        except Exception as e:  # noqa: BLE001
            print(f"N={N}: failed {type(e).__name__}", file=sys.stderr)
            continue
        out["sweep"][str(N)] = {"ns": ns, "seconds": t}
        print(f"N={N:7d} ns={ns:3d}: {t * 1e3:7.2f} ms/chunk", file=sys.stderr)

    # Single-FFT mode for reference.
    N = 1 << 20
    nf = N // 2 + 1
    re = jnp.asarray(rng.standard_normal((G, nf)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((G, nf)).astype(np.float32))

    @jax.jit
    def single_chain(token):
        s = sec + _delta(token)
        spec = jnp.fft.rfft(s, n=N)
        bank = re + 1j * im
        acc = jnp.float32(0.0)
        for _g in range(GROUPS):
            y = jnp.fft.irfft(spec[None, :] * bank, n=N, axis=1)
            acc = acc + jnp.sum(jnp.abs(y))
        return acc

    try:
        t = chained(single_chain)
        out["sweep"]["single_1M"] = {"ns": 1, "seconds": t}
        print(f"single 1M: {t * 1e3:7.2f} ms/chunk", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"single 1M failed: {type(e).__name__}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
