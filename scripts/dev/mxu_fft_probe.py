"""Can the MXU beat the backend FFT for the correlation irffts? NO (measured).

The backend FFT costs ~5-6 ms PER OP nearly independent of batch
(docs/scaling.md rule 5), so the two groups' irffts are ~10-11 ms of the
~24 ms lean step. Matmuls scale properly with batch on the MXU, so a
Bailey 4-step inverse FFT — N/2 = 16384 = 128 x 128 complex iFFT as two
(B*128, 128) x (128, 128) f32 HIGHEST-precision GEMM stages + twiddles,
wrapped in the half-size real-packing trick — computes BOTH groups in
ONE formulation with no per-op penalty.

Measured 2026-08-18 on the benchmark chip, (1344, 32768) irfft:

    backend (2 ops, the production shape)   10.19 ms
    MXU 4-step big-GEMM (1 formulation)     10.20 ms   rel err 2.1e-07

A tie: the ~45 GFLOP of GEMMs are cheap, but the three layout
transposes + unpack interleave (~350 MB/pass) and HIGHEST-precision
multi-pass matmuls give it all back. Kept as a probe only — the
production path stays on jnp.fft.irfft. (An earlier einsum formulation
without the explicit big-GEMM reshape lowered to 128^3 batched GEMMs
and was no faster; radix 64/256 variants measured the same or worse.)
"""
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
import jax, jax.numpy as jnp, numpy as np
HIGH = jax.lax.Precision.HIGHEST

def consts(M, r):
    s = M // r
    n2 = np.arange(s); k2 = np.arange(s)
    n1 = np.arange(r); k1 = np.arange(r)
    w_s = np.exp(2j*np.pi*np.outer(k2, n2)/s)   # transposed: (k2, n2) for right-matmul
    w_r = np.exp(2j*np.pi*np.outer(k1, n1)/r)   # (k1, n1)
    tw  = np.exp(2j*np.pi*np.outer(k1, n2)/M)   # (k1, n2)  [T[n2,k1] transposed]
    f = lambda a: jnp.asarray(a.astype(np.float32))
    return (f(w_s.real), f(w_s.imag)), (f(w_r.real), f(w_r.imag)), (f(tw.real), f(tw.imag)), r, s

def ifft4(xr, xi, c):
    """Big-GEMM 4-step: each stage is ONE (B*dim, 128)x(128,128) complex GEMM."""
    (wsr, wsi), (wrr, wri), (twr, twi), r, s = c
    b = xr.shape[0]
    # X[k] with k = k1 + r*k2  ->  (b, k2, k1) -> transpose -> (b, k1, k2)
    X2r = xr.reshape(b, s, r).transpose(0, 2, 1).reshape(b*r, s)
    X2i = xi.reshape(b, s, r).transpose(0, 2, 1).reshape(b*r, s)
    # Stage 1 (contract k2): A[b,k1,n2] = X2 @ Ws  ((b*r, s) @ (s, s))
    Ar = jnp.dot(X2r, wsr, precision=HIGH) - jnp.dot(X2i, wsi, precision=HIGH)
    Ai = jnp.dot(X2r, wsi, precision=HIGH) + jnp.dot(X2i, wsr, precision=HIGH)
    Ar = Ar.reshape(b, r, s); Ai = Ai.reshape(b, r, s)
    # Twiddle T[k1, n2]
    Br = Ar*twr[None] - Ai*twi[None]
    Bi = Ar*twi[None] + Ai*twr[None]
    # Stage 2 (contract k1): out[b,n2,n1] = B^T @ Wr  ((b*s, r) @ (r, r))
    Br2 = Br.transpose(0, 2, 1).reshape(b*s, r)
    Bi2 = Bi.transpose(0, 2, 1).reshape(b*s, r)
    Or = jnp.dot(Br2, wrr, precision=HIGH) - jnp.dot(Bi2, wri, precision=HIGH)
    Oi = jnp.dot(Br2, wri, precision=HIGH) + jnp.dot(Bi2, wrr, precision=HIGH)
    # (b, n2, n1) -> x[n1*s + n2] -> transpose -> (b, n1, n2)
    Or = Or.reshape(b, s, r).transpose(0, 2, 1).reshape(b, r*s)
    Oi = Oi.reshape(b, s, r).transpose(0, 2, 1).reshape(b, r*s)
    return Or, Oi

rng = np.random.default_rng(0)
M, r = 16384, 128
c = consts(M, r)
x = (rng.standard_normal((4, M)) + 1j*rng.standard_normal((4, M))).astype(np.complex64)
zr, zi = jax.jit(lambda a,b: ifft4(a,b,c))(jnp.asarray(x.real), jnp.asarray(x.imag))
want = np.fft.ifft(x, axis=1) * M
got = np.asarray(zr) + 1j*np.asarray(zi)
print("ifft4 rel err:", np.max(np.abs(got-want))/np.max(np.abs(want)), flush=True)

def irfft_consts(N, r):
    M = N//2
    k = np.arange(M)
    rot = np.exp(2j*np.pi*k/N)
    f = lambda a: jnp.asarray(a.astype(np.float32))
    return consts(M, r), (f(rot.real), f(rot.imag)), M

def irfft_mxu(hr, hi, ic):
    c4, (rotr, roti), M = ic
    har, hai = hr[:, :M], hi[:, :M]
    hbr = hr[:, M:0:-1]; hbi = -hi[:, M:0:-1]
    er, ei = har+hbr, hai+hbi            # E = H + conj(H[M-k])
    dr, di = har-hbr, hai-hbi            # D = H - conj(H[M-k])
    odr = rotr[None]*dr - roti[None]*di  # rot*D
    odi = rotr[None]*di + roti[None]*dr
    # Z = E/2 + i*(rot*D)/2
    gr = 0.5*(er - odi); gi = 0.5*(ei + odr)
    zr, zi = ifft4(gr, gi, c4)
    b = zr.shape[0]
    out = jnp.stack([zr, zi], axis=-1).reshape(b, 2*M)
    return out * (1.0/M)

N = 32768
ic = irfft_consts(N, 128)
sig = rng.standard_normal((8, N)).astype(np.float32)
spec = np.fft.rfft(sig, axis=1).astype(np.complex64)
out = jax.jit(lambda a,b: irfft_mxu(a,b,ic))(jnp.asarray(spec.real), jnp.asarray(spec.imag))
want2 = np.fft.irfft(spec, n=N, axis=1)
print("irfft_mxu rel err:", np.max(np.abs(np.asarray(out)-want2))/np.max(np.abs(want2)), flush=True)

B = 1344
hr = jnp.asarray(rng.standard_normal((B, N//2+1)).astype(np.float32))
hi = jnp.asarray(rng.standard_normal((B, N//2+1)).astype(np.float32))
def time_chained(fn, iters=8):
    tok = jnp.float32(0.0); tok = jax.block_until_ready(fn(tok)); best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); t = tok
        for _ in range(iters): t = fn(t)
        jax.block_until_ready(t); best = min(best, (time.perf_counter()-t0)/iters)
    return best*1e3
@jax.jit
def p_backend_2ops(tok):
    h1 = (hr[:B//2] + tok*1e-12) + 1j*hi[:B//2]
    h2 = (hr[B//2:] + tok*1e-12) + 1j*hi[B//2:]
    return (jnp.sum(jnp.fft.irfft(h1, n=N, axis=1)) + jnp.sum(jnp.fft.irfft(h2, n=N, axis=1)))*1e-12
@jax.jit
def p_mxu(tok):
    return jnp.sum(irfft_mxu(hr + tok*1e-12, hi, ic))*1e-12
print(f"perf ({B},{N}): backend-2ops {time_chained(p_backend_2ops):.2f} ms   mxu-bigGEMM {time_chained(p_mxu):.2f} ms", flush=True)
for rr in (64, 256):
    ic2 = irfft_consts(N, rr)
    @jax.jit
    def p2(tok, ic2=ic2):
        return jnp.sum(irfft_mxu(hr + tok*1e-12, hi, ic2))*1e-12
    print(f"mxu r={rr}: {time_chained(p2):.2f} ms", flush=True)
