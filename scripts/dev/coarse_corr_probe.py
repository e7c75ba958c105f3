"""VERDICT r3 #7: can a reduced-precision coarse correlation tier cut the
corr stage (~10.8 ms at 60 s chunks — the linear floor)?

Key fact: the backend FFT is f32/c64-only — there is no reduced-precision
FFT to exploit. The only formulation where precision buys speed is the
MXU 4-step GEMM irfft (scripts/dev/mxu_fft_probe.py — measured a dead
TIE with the backend FFT at f32 HIGHEST). This probe re-runs that
formulation with:

  f32-HIGHEST   - the round-3 tie baseline (sanity anchor)
  f32-DEFAULT   - single-pass f32 matmuls
  bf16          - inputs/intermediates bf16, DEFAULT matmuls: GEMM
                  FLOPs ~2x cheaper AND the layout transposes move half
                  the bytes (they were half the tie's cost)

and reports speed at the production shape (1344, 32768) plus max
relative error vs the exact f32 irfft — the margin a coarse candidate
flag would need. Decision rule: only if a reduced-precision rung is
>=2x faster than the backend FFT is a two-tier coarse scan worth its
plumbing (flag rows in a coarse launch, exact f32 re-correlate flagged
rows; decisions still read f32 bits).

Timing per docs/scaling.md rule 10: never-repeating token chains,
host-value sync.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST
DEFAULT = jax.lax.Precision.DEFAULT


def consts(M, r, dtype):
    s = M // r
    n2 = np.arange(s)
    k2 = np.arange(s)
    n1 = np.arange(r)
    k1 = np.arange(r)
    w_s = np.exp(2j * np.pi * np.outer(k2, n2) / s)
    w_r = np.exp(2j * np.pi * np.outer(k1, n1) / r)
    tw = np.exp(2j * np.pi * np.outer(k1, n2) / M)
    f = lambda a: jnp.asarray(a.astype(np.float32)).astype(dtype)
    return (
        (f(w_s.real), f(w_s.imag)),
        (f(w_r.real), f(w_r.imag)),
        (f(tw.real), f(tw.imag)),
        r,
        s,
    )


def ifft4(xr, xi, c, prec):
    (wsr, wsi), (wrr, wri), (twr, twi), r, s = c
    b = xr.shape[0]
    X2r = xr.reshape(b, s, r).transpose(0, 2, 1).reshape(b * r, s)
    X2i = xi.reshape(b, s, r).transpose(0, 2, 1).reshape(b * r, s)
    Ar = jnp.dot(X2r, wsr, precision=prec) - jnp.dot(X2i, wsi, precision=prec)
    Ai = jnp.dot(X2r, wsi, precision=prec) + jnp.dot(X2i, wsr, precision=prec)
    Ar = Ar.reshape(b, r, s)
    Ai = Ai.reshape(b, r, s)
    Br = Ar * twr[None] - Ai * twi[None]
    Bi = Ar * twi[None] + Ai * twr[None]
    Br2 = Br.transpose(0, 2, 1).reshape(b * s, r)
    Bi2 = Bi.transpose(0, 2, 1).reshape(b * s, r)
    Or = jnp.dot(Br2, wrr, precision=prec) - jnp.dot(Bi2, wri, precision=prec)
    Oi = jnp.dot(Br2, wri, precision=prec) + jnp.dot(Bi2, wrr, precision=prec)
    Or = Or.reshape(b, s, r).transpose(0, 2, 1).reshape(b, r * s)
    Oi = Oi.reshape(b, s, r).transpose(0, 2, 1).reshape(b, r * s)
    return Or, Oi


def irfft_consts(N, r, dtype):
    M = N // 2
    k = np.arange(M)
    rot = np.exp(2j * np.pi * k / N)
    f = lambda a: jnp.asarray(a.astype(np.float32)).astype(dtype)
    return consts(M, r, dtype), (f(rot.real), f(rot.imag)), M


def irfft_mxu(hr, hi, ic, prec, dtype):
    c4, (rotr, roti), M = ic
    hr = hr.astype(dtype)
    hi = hi.astype(dtype)
    har, hai = hr[:, :M], hi[:, :M]
    hbr = hr[:, M:0:-1]
    hbi = -hi[:, M:0:-1]
    er, ei = har + hbr, hai + hbi
    dr, di = har - hbr, hai - hbi
    odr = rotr[None] * dr - roti[None] * di
    odi = rotr[None] * di + roti[None] * dr
    half = jnp.asarray(0.5, dtype)
    gr = half * (er - odi)
    gi = half * (ei + odr)
    zr, zi = ifft4(gr, gi, c4, prec)
    b = zr.shape[0]
    out = jnp.stack([zr, zi], axis=-1).reshape(b, 2 * M)
    return out.astype(jnp.float32) * (1.0 / M)


def main() -> None:
    rng = np.random.default_rng(0)
    B, N = 1344, 32768
    iters = int(os.environ.get("APD_PROBE_ITERS", "8"))

    sig = rng.standard_normal((B, N)).astype(np.float32)
    spec = np.fft.rfft(sig, axis=1).astype(np.complex64)
    hr = jnp.asarray(spec.real.astype(np.float32))
    hi = jnp.asarray(spec.imag.astype(np.float32))
    want = np.fft.irfft(spec, n=N, axis=1)
    scale = np.max(np.abs(want))

    out = {"platform": jax.devices()[0].platform, "B": B, "N": N}
    salt = np.float32((time.time() % 1000) / 1e5)

    def chained(fn):
        tok = jnp.float32(salt)
        _ = float(np.asarray(fn(tok)))  # warm
        samples = []
        for _rep in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            tok0 = tok
            for _ in range(iters):
                tok0 = tok0 + jnp.float32(1.0)
                acc = acc + fn(tok0)
            _ = float(np.asarray(acc))
            samples.append((time.perf_counter() - t0) / iters)
        return 1e3 * float(np.median(samples[1:]))

    # Backend FFT baseline (2 ops, the production split).
    @jax.jit
    def p_backend(tok):
        h1 = (hr[: B // 2] + tok * 1e-12) + 1j * hi[: B // 2]
        h2 = (hr[B // 2 :] + tok * 1e-12) + 1j * hi[B // 2 :]
        return (
            jnp.sum(jnp.fft.irfft(h1, n=N, axis=1))
            + jnp.sum(jnp.fft.irfft(h2, n=N, axis=1))
        ) * 1e-12

    out["backend_ms"] = round(chained(p_backend), 2)
    print(f"backend 2-op irfft: {out['backend_ms']} ms", file=sys.stderr)

    for name, prec, dtype in (
        ("f32_highest", HIGH, jnp.float32),
        ("f32_default", DEFAULT, jnp.float32),
        ("bf16", DEFAULT, jnp.bfloat16),
    ):
        ic = irfft_consts(N, 128, dtype)

        @jax.jit
        def p_mxu(tok, ic=ic, prec=prec, dtype=dtype):
            return (
                jnp.sum(irfft_mxu(hr + tok * 1e-12, hi, ic, prec, dtype))
                * 1e-12
            )

        got = np.asarray(
            jax.jit(
                lambda a, b, ic=ic, prec=prec, dtype=dtype: irfft_mxu(
                    a, b, ic, prec, dtype
                )
            )(hr, hi)
        )
        rel = float(np.max(np.abs(got - want)) / scale)
        ms = chained(p_mxu)
        out[f"{name}_ms"] = round(ms, 2)
        out[f"{name}_rel_err"] = float(f"{rel:.3e}")
        print(f"mxu {name}: {ms:.2f} ms  rel_err {rel:.2e}", file=sys.stderr)

    out["verdict"] = (
        "coarse tier viable"
        if min(out.get("bf16_ms", 1e9), out.get("f32_default_ms", 1e9))
        <= 0.5 * out["backend_ms"]
        else "negative: no reduced-precision rung is >=2x the backend FFT"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
