"""Is irfft lowered efficiently on this backend? Pair-packing probe.

The correlate stage spends its time in irfft over (G, ns, N). If the
backend lowers irfft as a full complex ifft (+ hermitian assembly), two
real inverse transforms can ride ONE complex ifft:

    z = ifft(Y1 + i*Y2)  ->  y1 = Re(z), y2 = Im(z)

(for real y1, y2 with full hermitian spectra Y1, Y2). This probe times,
dependency-chained in one jit per variant, on the flagship shapes
(G=32, ns=21, N=32768):

  a. jnp.fft.irfft over (G*ns, N//2+1) -> (G*ns, N)
  b. hermitian-extend + pair-packed complex ifft over (G*ns/2, N)
  c. full complex ifft over (G*ns, N)   [lowering-cost reference]

Run in a healthy window: python scripts/dev/fft_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("APD_PROBE_ITERS", "10"))
REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))


def _delta(token):
    return jnp.where(jnp.isnan(token), 1.0, 0.0)


def time_chained(step):
    token = jnp.float32(0.0)
    token = jax.block_until_ready(step(token))
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        tok = token
        for _ in range(ITERS):
            tok = step(tok)
        jax.block_until_ready(tok)
        samples.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(samples))


def hermitian_full(spec_half: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, n//2+1) rfft spectrum → (B, n) full hermitian spectrum."""
    mid = jnp.conj(spec_half[:, 1:-1][:, ::-1])
    return jnp.concatenate([spec_half, mid], axis=1)


def main() -> None:
    G, ns, N = 32, 21, 32768
    B = G * ns
    rng = np.random.default_rng(0)
    # Realistic input: spectra of random real signals (f32 (re, im) pair
    # upload — complex h2d is rejected by the tunnel).
    y = rng.standard_normal((B, N)).astype(np.float32)
    spec_np = np.fft.rfft(y).astype(np.complex64)
    re = jnp.asarray(spec_np.real.astype(np.float32))
    im = jnp.asarray(spec_np.imag.astype(np.float32))

    out = {"platform": jax.devices()[0].platform, "shape": [B, N]}

    @jax.jit
    def irfft_chain(token):
        spec = (re + _delta(token)) + 1j * im
        z = jnp.fft.irfft(spec, n=N, axis=1)
        return jnp.sum(jnp.abs(z))

    out["irfft_s"] = time_chained(irfft_chain)
    print(f"irfft        (B={B}): {out['irfft_s'] * 1e3:7.2f} ms", file=sys.stderr)

    @jax.jit
    def paired_chain(token):
        spec = (re + _delta(token)) + 1j * im
        full = hermitian_full(spec, N)  # (B, N)
        z = jnp.fft.ifft(full[0::2] + 1j * full[1::2], axis=1)  # (B/2, N)
        y1 = jnp.real(z)
        y2 = jnp.imag(z)
        return jnp.sum(jnp.abs(y1)) + jnp.sum(jnp.abs(y2))

    out["paired_ifft_s"] = time_chained(paired_chain)
    print(f"paired ifft  (B={B // 2}): {out['paired_ifft_s'] * 1e3:7.2f} ms",
          file=sys.stderr)

    @jax.jit
    def ifft_chain(token):
        spec = (re + _delta(token)) + 1j * im
        full = hermitian_full(spec, N)
        z = jnp.fft.ifft(full, axis=1)
        return jnp.sum(jnp.abs(z))

    out["full_ifft_s"] = time_chained(ifft_chain)
    print(f"full ifft    (B={B}): {out['full_ifft_s'] * 1e3:7.2f} ms",
          file=sys.stderr)

    # Forward side for reference: rfft of the (ns, N) real segments.
    seg = jnp.asarray(y[:ns])

    @jax.jit
    def rfft_chain(token):
        return jnp.sum(jnp.abs(jnp.fft.rfft(seg + _delta(token), axis=1)))

    out["rfft_ns_s"] = time_chained(rfft_chain)
    print(f"rfft         (B={ns}): {out['rfft_ns_s'] * 1e3:7.2f} ms",
          file=sys.stderr)

    # Numerical check of the pairing identity (host, f64).
    spec_h = np.fft.rfft(y[:4].astype(np.float64))
    full = np.concatenate(
        [spec_h, np.conj(spec_h[:, 1:-1][:, ::-1])], axis=1
    )
    z = np.fft.ifft(full[0::2] + 1j * full[1::2], axis=1)
    err = max(
        np.abs(np.real(z) - y[:4][0::2]).max(),
        np.abs(np.imag(z) - y[:4][1::2]).max(),
    )
    out["pairing_identity_err"] = float(err)
    print(f"pairing identity max err: {err:.2e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
