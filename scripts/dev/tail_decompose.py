"""Decompose the lean step's verify tail: compaction vs per-kind verifiers.

step_decompose.py attributes ~5 ms marginal to "bounds + compaction +
verifiers" on the flagship shapes. This ladder splits that tail so the
addressable share is visible per verifier kind:

  mask      — mask/plateau/block-max + in-program greedy (both groups);
              the baseline every later rung builds on
  compact   — + bounds checks, ascending-position compaction, overflow
              guard for both groups (verify skipped: accept = alive)
  vnormal   — + the NORMAL group's verifier (MSE partitions + window-max
              downsample + 3-window Pearson)
  vmarker   — + the MARKER group's verifier (whole-window Hann rfft
              purity + framed 25 ms STFT) instead of the normal one
  tail_full — + both verifiers = the production lean tail

Marginal(vnormal) - marginal(compact) isolates the normal verifier;
marginal(vmarker) - marginal(compact) isolates the marker verifier (its
small-FFT fixed cost is the suspected dominant term).

Run in a healthy window:  python scripts/dev/tail_decompose.py
Writes bench_results/tail_decompose.json.
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

ITERS = int(os.environ.get("APD_PROBE_ITERS", "10"))
REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))


def time_chained(step) -> float:
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


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import _BIG, _SMALL_TIER
    from audio_pattern_detector_tpu.ops.correlate import (
        bank_correlate,
        section_segment_spectra,
    )
    from audio_pattern_detector_tpu.ops.loudness import (
        integrated_loudness_device,
        loudness_normalize_device,
    )
    from audio_pattern_detector_tpu.ops.peaks import (
        greedy_survivors_blockwise,
        long_plateau_present,
        short_run_local_maxima_mask,
    )
    from audio_pattern_detector_tpu.ops.verify import verify_marker, verify_normal

    sr = 8000
    bank, _clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=60)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    metas = bank._metas[sw]
    S = cls["section_len"]
    loud = cls["loud"]
    gcs = tuple((g.corr, g.verify) for g in cls["groups"])
    height_min = bank.height_min

    rng = np.random.default_rng(0)
    base = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))

    def tok_mix(token):
        return base + token * jnp.float32(1e-12)

    def out_tok(x):
        return jnp.sum(x) * jnp.float32(1e-12)

    first = gcs[0][0]
    shared = all(
        (c.fft_len, c.step, c.pad_left, c.num_segments)
        == (first.fft_len, first.step, first.pad_left, first.num_segments)
        for c, _ in gcs
    )

    def front(token):
        """Shared front: loudness + section FFT + correlations + greedy."""
        sec = tok_mix(token)
        lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
        norm = loudness_normalize_device(sec, lufs)
        spec = section_segment_spectra(norm, first) if shared else None
        rows = []
        for (kind, m, k_detect, k_verify), (cc, vc) in zip(metas, gcs):
            corr, valid_len = bank_correlate(norm, jnp.int32(S), cc, spec)
            L = corr.shape[1]
            idx = jnp.arange(L, dtype=jnp.int32)[None, :]
            x = jnp.where(idx < valid_len, corr, -jnp.inf)
            mask = short_run_local_maxima_mask(x) & (x >= height_min)
            plateau = long_plateau_present(x, height_min)
            scored = jnp.where(mask, x, -jnp.inf)
            k_lanes = min(_SMALL_TIER, k_detect)
            pos, height, overflow = greedy_survivors_blockwise(scored, m, k_lanes)
            rows.append(
                (kind, m, k_verify, vc, norm, corr, valid_len, pos, height,
                 plateau, overflow)
            )
        return rows

    def tail(row, verify_kinds):
        (kind, m, k_verify, vc, norm, corr, valid_len, pos, height,
         plateau, overflow) = row
        alive = jnp.isfinite(height)
        keep = alive
        half = (2 * m - 1) // 2
        keep = keep & ~(pos + half > valid_len + 5) & ~(pos - half < -5)
        kv = min(k_verify, pos.shape[1])
        score = jnp.where(keep, -pos, -_BIG)
        sv, _ = jax.lax.top_k(score, kv)
        vpos = -sv
        valive = sv > -_BIG
        verify_overflow = jnp.sum(keep, axis=1) > kv
        if kind in verify_kinds:
            if kind == "marker":
                accept = verify_marker(norm, vpos, valive, vc)
            else:
                accept = verify_normal(corr, vpos, valive, vc)[0]
        else:
            accept = valive
        sel = (valive & accept).astype(jnp.float32)
        return (
            out_tok(vpos.astype(jnp.float32))
            + out_tok(sel)
            + out_tok(verify_overflow.astype(jnp.float32))
            + out_tok(plateau.astype(jnp.float32))
            + out_tok(overflow.astype(jnp.float32))
        )

    def make_rung(verify_kinds):
        @jax.jit
        def p(token):
            rows = front(token)
            return sum(tail(r, verify_kinds) for r in rows)

        return p

    @jax.jit
    def p_mask(token):
        rows = front(token)
        acc = jnp.float32(0.0)
        for r in rows:
            acc += out_tok(r[8]) + out_tok(r[10].astype(jnp.float32))
            acc += out_tok(r[9].astype(jnp.float32))
        return acc

    ladder = [
        ("mask", p_mask),
        ("compact", make_rung(frozenset())),
        ("vnormal", make_rung(frozenset({"normal"}))),
        ("vmarker", make_rung(frozenset({"marker"}))),
        ("tail_full", make_rung(frozenset({"normal", "marker"}))),
    ]

    results: dict[str, float] = {}
    prev = 0.0
    for name, fn in ladder:
        t = time_chained(fn)
        results[name] = t
        print(
            f"{name:10s} cumulative {t * 1e3:8.2f} ms   "
            f"marginal vs mask {(t - results['mask']) * 1e3:+8.2f} ms",
            flush=True,
        )
        prev = t

    base_t = results["compact"]
    out = {
        "platform": jax.devices()[0].platform,
        "iters": ITERS,
        "repeats": REPEATS,
        "cumulative_s": results,
        "isolated_ms": {
            "compaction": round((results["compact"] - results["mask"]) * 1e3, 3),
            "verify_normal": round((results["vnormal"] - base_t) * 1e3, 3),
            "verify_marker": round((results["vmarker"] - base_t) * 1e3, 3),
            "tail_total": round((results["tail_full"] - results["mask"]) * 1e3, 3),
        },
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "bench_results",
        "tail_decompose.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["isolated_ms"]))


if __name__ == "__main__":
    main()
