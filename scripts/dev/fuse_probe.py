"""Dev probe (TPU, chained): candidate structural optimizations.

1. top_k / mask / greedy on two (32, L) groups separately vs one stacked
   (64, L) call — do per-call fixed costs dominate?
2. Correlation with different overlap-save FFT lengths (32k/64k/128k) and
   whole-FFT mode — is the irfft batch shape the limiter?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("APD_PROFILE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from audio_pattern_detector_tpu.ops.correlate import build_correlation_bank
from audio_pattern_detector_tpu.ops.correlate import bank_correlate
from audio_pattern_detector_tpu.ops.peaks import (
    find_peaks_device_fast,
)

G, L = 32, 496000
S = 488000

rng = np.random.default_rng(0)
corr1 = jnp.asarray((np.abs(rng.standard_normal((G, L))) * 0.2).astype(np.float32))
corr2 = jnp.asarray((np.abs(rng.standard_normal((G, L))) * 0.2).astype(np.float32))
section = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
valid_len = jnp.float32(L)


def delta(tok):
    return jnp.where(jnp.isnan(tok), 1.0, 0.0)


def timeit(step, *args, iters=5, repeats=2):
    tok = jax.block_until_ready(step(jnp.float32(0.0), *args))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        t = tok
        for _ in range(iters):
            t = step(t, *args)
        jax.block_until_ready(t)
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples))


def peaks_all(c, vl, m, kd, kv):
    cand, flag = find_peaks_device_fast(c, vl, 0.25, m, kd)
    return (
        jnp.sum(cand.pos) + jnp.sum(cand.alive) + jnp.sum(flag)
    ).astype(jnp.float32)


@jax.jit
def two_groups(tok, c1, c2, vl):
    a = peaks_all(c1 + delta(tok), vl.astype(jnp.int32), 2000, 1088, 272)
    b = peaks_all(c2 + delta(tok), vl.astype(jnp.int32), 8000, 264, 66)
    return a + b


stacked = jnp.concatenate([corr1, corr2], axis=0)


@jax.jit
def one_stacked(tok, st, vl):
    # same k_detect for all rows (max of the two), same distance is NOT
    # semantically right — this probes COST only (per-row distance comes in
    # the real implementation).
    return peaks_all(st + delta(tok), vl.astype(jnp.int32), 2000, 1088, 272)


print("peaks two groups  :", round(timeit(two_groups, corr1, corr2, valid_len) * 1e3, 1), "ms", flush=True)
print("peaks one stacked :", round(timeit(one_stacked, stacked, valid_len) * 1e3, 1), "ms", flush=True)

# Correlation FFT-size sweep (normal group m=8000).
clips = (0.4 * rng.standard_normal((G, 8000))).astype(np.float32)
self_max = np.abs(rng.standard_normal(G)).astype(np.float64) + 5.0
for mult, label in [(1, "fft 32k (prod)"), (2, "fft 64k"), (4, "fft 128k"), (0, "whole fft")]:
    import audio_pattern_detector_tpu.ops.correlate as C

    orig = C._overlap_save_geometry
    if mult == 0:
        consts = build_correlation_bank(clips, self_max, S, overlap_save=False)
    else:
        def geom(section_len, m, _mult=mult, _orig=orig):
            fft_len = C.next_pow2(max(4 * m, 8192)) * _mult
            whole = C.next_pow2(section_len + m - 1)
            if fft_len >= whole:
                return whole, 0, 1
            step = fft_len - m + 1
            return fft_len, step, -(-(section_len + m - 1) // step)

        C._overlap_save_geometry = geom
        try:
            consts = build_correlation_bank(clips, self_max, S, overlap_save=True)
        finally:
            C._overlap_save_geometry = orig

    @jax.jit
    def corr_step(tok, sec, consts=consts):
        c, _ = bank_correlate(sec + delta(tok), jnp.float32(S), consts)
        return jnp.sum(c)

    print(f"correlate {label:14s}: {timeit(corr_step, section)*1e3:7.1f} ms  "
          f"(fft_len={consts.fft_len}, segs={consts.num_segments})", flush=True)
