"""Why do batched offline modes run ~2.6x the single-chunk device time?

Dependency-chained timing of the flagship class program in three forms:
single fused step, vmapped batch (B=2/4), and unrolled scan (B=4) — plus
per-stage vmapped probes (correlate / peaks / verify) to localise any
batch-mode inflation.

Run in a healthy window: python scripts/dev/batch_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_bank
from audio_pattern_detector_tpu.models.bank import (
    _class_step_batch_jit,
    _class_step_fused_jit,
    _class_step_scan_jit,
)

ITERS = int(os.environ.get("APD_PROBE_ITERS", "10"))


def _delta(token):
    """Data dependency XLA cannot fold away (always 0.0 at runtime)."""
    return jnp.where(jnp.isnan(token), 1.0, 0.0)

REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))


def time_chained(step, x0):
    """Median seconds/iteration: output feeds next input, one final sync."""
    out = jax.block_until_ready(step(x0))
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        tok = out
        for _ in range(ITERS):
            tok = step(tok)
        jax.block_until_ready(tok)
        samples.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(samples))


def main() -> None:
    sr, chunk_seconds = 8000, 60
    bank, _ = _make_bank(num_normal=32, num_marker=32, chunk_seconds=chunk_seconds)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])
    metas = bank._metas[sw]
    hm = bank.height_min

    rng = np.random.default_rng(0)
    sec = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
    nv = jnp.float32(S)

    out = {"platform": jax.devices()[0].platform, "section_len": S}

    def single(tok):
        flat = _class_step_fused_jit(
            sec + _delta(tok), nv, cls["loud"], group_consts,
            metas=metas, height_min=hm,
        )
        return flat[0]

    out["single_s"] = time_chained(single, jnp.float32(0.0))
    print(f"single fused: {out['single_s'] * 1e3:.1f} ms/chunk", file=sys.stderr)

    for B in (2, 4):
        secs = jnp.asarray(
            (0.05 * rng.standard_normal((B, S))).astype(np.float32)
        )
        nvs = jnp.full((B,), float(S), dtype=jnp.float32)

        def batch(tok, secs=secs, nvs=nvs):
            flat = _class_step_batch_jit(
                secs + _delta(tok), nvs, cls["loud"], group_consts,
                metas=metas, height_min=hm,
            )
            return flat[0, 0]

        t = time_chained(batch, jnp.float32(0.0))
        out[f"vmap_B{B}_s_per_chunk"] = t / B
        print(f"vmap B={B}: {t * 1e3:.1f} ms -> {t / B * 1e3:.1f} ms/chunk",
              file=sys.stderr)

    B = 4
    secs = jnp.asarray((0.05 * rng.standard_normal((B, S))).astype(np.float32))
    nvs = jnp.full((B,), float(S), dtype=jnp.float32)

    def scan(tok):
        flat = _class_step_scan_jit(
            secs + _delta(tok), nvs, cls["loud"], group_consts,
            metas=metas, height_min=hm,
        )
        return flat[0, 0]

    t = time_chained(scan, jnp.float32(0.0))
    out[f"scan_B{B}_s_per_chunk"] = t / B
    print(f"scan B={B}: {t * 1e3:.1f} ms -> {t / B * 1e3:.1f} ms/chunk",
          file=sys.stderr)

    # ── Per-stage vmapped probes (B=4) to localise inflation ──
    from audio_pattern_detector_tpu.ops.correlate import (
        bank_correlate,
        section_segment_spectra,
    )
    from audio_pattern_detector_tpu.ops.loudness import (
        integrated_loudness_device,
        loudness_normalize_device,
    )

    loud = cls["loud"]

    def one_norm(s, n):
        lufs = integrated_loudness_device(s, n.astype(jnp.int32), loud)
        return loudness_normalize_device(s, lufs)

    norm_b = jax.block_until_ready(
        jax.jit(jax.vmap(one_norm))(secs, nvs)
    )

    for gi, (gc, _gv) in enumerate(group_consts):
        def corr_stage(tok, gc=gc):
            def one(s):
                c, _ = bank_correlate(s, jnp.int32(S), gc)
                return jnp.sum(c)

            return jnp.sum(jax.vmap(one)(norm_b + _delta(tok)))

        t = time_chained(jax.jit(corr_stage), jnp.float32(0.0))
        out[f"vmap_corr_g{gi}_s_per_chunk"] = t / B
        print(f"vmap corr g{gi}: {t / B * 1e3:.2f} ms/chunk", file=sys.stderr)

    # Lean peaks tail (mask + counts + hierarchical topk + greedy + compact)
    from audio_pattern_detector_tpu.ops.peaks import (
        long_plateau_present,
        short_run_local_maxima_mask,
        topk_sparse,
    )

    gc0 = group_consts[0][0]
    corr_b = jax.block_until_ready(
        jax.jit(jax.vmap(lambda s: bank_correlate(s, jnp.int32(S), gc0)[0]))(
            norm_b
        )
    )

    def peaks_stage(tok):
        def one(corr):
            x = corr + _delta(tok)
            mask = short_run_local_maxima_mask(x) & (x >= hm)
            plateau = long_plateau_present(x, hm)
            scored = jnp.where(mask, x, -jnp.inf)
            h, p = topk_sparse(scored, 16)
            return jnp.sum(h) + jnp.sum(p).astype(jnp.float32) + jnp.sum(
                plateau
            ).astype(jnp.float32) + jnp.sum(mask).astype(jnp.float32)

        return jnp.sum(jax.vmap(one)(corr_b))

    t = time_chained(jax.jit(peaks_stage), jnp.float32(0.0))
    out["vmap_peaks_s_per_chunk"] = t / B
    print(f"vmap peaks: {t / B * 1e3:.2f} ms/chunk", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
