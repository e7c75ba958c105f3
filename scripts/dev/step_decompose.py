"""Decompose the flagship device step: backend-fixed vs addressable cost.

VERDICT r1 #4: the measured ~24 ms device step sits ~18× above the
HBM-bandwidth floor (~1.3 ms); this probe attributes the gap. It times a
cumulative ladder of programs on the flagship shapes (64-clip bank, 60 s
chunk), each dependency-chained through a token so the runtime cannot
memoise or overlap iterations (the only trustworthy method on this
backend — see docs/scaling.md):

  launch   — trivial token program: per-launch RPC floor
  loudness — + integrated loudness + normalize (rfft/irfft conv pair)
  secfft   — + class-shared section segment FFT
  corr     — + both groups' correlation irffts (normalised lean form)
  mask     — + candidate mask/counts/plateau + hierarchical top-k
  tail     — + greedy filter, bounds, compaction, both verifiers =
              the full lean class step (cross-check vs _class_step_jit)

Marginal cost of each stage = its cumulative time minus the previous
stage's. The backend-fixed share is `launch` + the irffts at the
backend FFT's measured per-row rate (~10 us/row at 32k, LINEAR in
rows — scripts/dev/irfft_batch_probe.py, round-3 correction of the
round-2 "fixed per-op cost" model); the rest is addressable.

Run in a healthy window:  python scripts/dev/step_decompose.py
Writes bench_results/step_decompose.json.
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
# VERDICT r2 #1: the ladder is parametric in chunk size so the big-chunk
# configurations (120/240/480 s) get the same device-only attribution as
# the 60 s flagship — that's what decides whether per-op FFT cost is
# fixed (launch-amortisation model) or byte-bound (linear model).
CHUNK_SECONDS = int(os.environ.get("APD_PROBE_CHUNK_SECONDS", "60"))


# Wall-time salt + a token that advances ~+1 per call: the runtime
# memoises value-identical executions server-side (the cache survives
# the client process) and block_until_ready can return early — a host
# value fetch is the only reliable sync. See docs/scaling.md rule 10
# and scripts/dev/irfft_batch_probe.py for the measured failure modes.
_SALT = float(int(time.time()) % 86400)


def time_chained(step) -> float:
    global _SALT
    tok = step(jnp.float32(_SALT))  # compile + warm
    float(tok)
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            tok = step(tok)  # token keeps advancing: never replayed
        tv = float(tok)
        samples.append((time.perf_counter() - t0) / ITERS)
    _SALT = tv + 100.0
    return float(np.median(samples))


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import (
        _class_step_jit,
        _lean_group_packed,
    )
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

    sr = 8000
    bank, _clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=CHUNK_SECONDS
    )
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
        # Fold the token into the section so every stage depends on the
        # previous iteration's output — at a VISIBLE, bounded scale
        # (sin keeps it bounded as the token advances by +1 per call;
        # 1e-3 of a noise signal changes f32 bits without creating
        # detections), so no two calls are ever value-identical and the
        # runtime's server-side memoisation cannot fire (rule 10).
        return base * (jnp.float32(1.0) + jnp.sin(token) * jnp.float32(1e-3))

    def out_tok(x):
        return jnp.sum(x) * jnp.float32(1e-12)

    first = gcs[0][0]
    shared = all(
        (c.fft_len, c.step, c.pad_left, c.num_segments)
        == (first.fft_len, first.step, first.pad_left, first.num_segments)
        for c, _ in gcs
    )

    @jax.jit
    def p_launch(token):
        return token + jnp.float32(1.0)

    @jax.jit
    def p_loudness(token):
        sec = tok_mix(token)
        lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
        norm = loudness_normalize_device(sec, lufs)
        return token + jnp.float32(1.0) + out_tok(norm)

    @jax.jit
    def p_secfft(token):
        sec = tok_mix(token)
        lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
        norm = loudness_normalize_device(sec, lufs)
        spec = section_segment_spectra(norm, first) if shared else norm
        return token + jnp.float32(1.0) + out_tok(jnp.abs(spec))

    def correlations(norm, spec):
        # Production lean path: normalised correlation (the divide fuses
        # into the irfft consumer chain — see _class_step).
        return [
            bank_correlate(norm, jnp.int32(S), c, spec) for c, _ in gcs
        ]

    @jax.jit
    def p_corr(token):
        sec = tok_mix(token)
        lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
        norm = loudness_normalize_device(sec, lufs)
        spec = section_segment_spectra(norm, first) if shared else None
        outs = correlations(norm, spec)
        return token + jnp.float32(1.0) + sum(out_tok(corr) for corr, _ in outs)

    @jax.jit
    def p_mask(token):
        sec = tok_mix(token)
        lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
        norm = loudness_normalize_device(sec, lufs)
        spec = section_segment_spectra(norm, first) if shared else None
        acc = jnp.float32(0.0)
        for (kind, m, k_detect, k_verify), (corr, valid_len) in zip(
            metas, correlations(norm, spec)
        ):
            L = corr.shape[1]
            idx = jnp.arange(L, dtype=jnp.int32)[None, :]
            x = jnp.where(idx < valid_len, corr, -jnp.inf)
            mask = short_run_local_maxima_mask(x) & (x >= height_min)
            plateau = long_plateau_present(x, height_min)
            scored = jnp.where(mask, x, -jnp.inf)
            # Production lean path: in-program greedy survivors
            # (blockwise argmax-suppress; replaced topk_sparse round 2).
            p, h, overflow = greedy_survivors_blockwise(scored, m, 16)
            acc += out_tok(h) + out_tok(overflow.astype(jnp.float32))
            acc += out_tok(plateau.astype(jnp.float32))
        return token + jnp.float32(1.0) + acc

    @jax.jit
    def p_full(token):
        sec = tok_mix(token)
        outs = _class_step_jit(
            sec,
            jnp.float32(S),
            loud,
            gcs,
            metas=metas,
            height_min=height_min,
            lean=True,
        )
        return token + jnp.float32(1.0) + sum(out_tok(o["packed"]) for o in outs)

    ladder = [
        ("launch", p_launch),
        ("loudness", p_loudness),
        ("secfft", p_secfft),
        ("corr", p_corr),
        ("mask", p_mask),
        ("full_lean_step", p_full),
    ]

    # Pallas A/B rungs: same ladder positions with the single-pass Mosaic
    # candidate scan in place of the multi-pass mask stage. TPU-only (the
    # Mosaic kernel does not lower on the CPU backend); APD_PROBE_PALLAS=0
    # skips them in a hurry.
    if (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("APD_PROBE_PALLAS") != "0"
    ):
        from audio_pattern_detector_tpu.ops.correlate import (
            bank_correlate_abs,
        )
        from audio_pattern_detector_tpu.ops.pallas_peaks import candidate_scan

        @jax.jit
        def p_mask_pallas(token):
            sec = tok_mix(token)
            lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
            norm = loudness_normalize_device(sec, lufs)
            spec = section_segment_spectra(norm, first) if shared else None
            acc = jnp.float32(0.0)
            for (kind, m, k_detect, k_verify), (cc, _vc) in zip(metas, gcs):
                corr, valid_len = bank_correlate_abs(
                    norm, jnp.int32(S), cc, spec
                )
                thr_min = height_min * cc.self_corr_max
                bmax, count_min, plateau_min, omax, _near = candidate_scan(
                    corr, thr_min, valid_len
                )
                acc += out_tok(bmax) + out_tok(omax)
                acc += out_tok(count_min.astype(jnp.float32))
                acc += out_tok(plateau_min.astype(jnp.float32))
            return token + jnp.float32(1.0) + acc

        @jax.jit
        def p_full_pallas(token):
            sec = tok_mix(token)
            outs = _class_step_jit(
                sec,
                jnp.float32(S),
                loud,
                gcs,
                metas=metas,
                height_min=height_min,
                lean=True,
                pallas=True,
            )
            return token + jnp.float32(1.0) + sum(
                out_tok(o["packed"]) for o in outs
            )

        ladder += [
            ("mask_pallas", p_mask_pallas),
            ("full_pallas", p_full_pallas),
        ]

    # Merged-irfft A/B rungs (VERDICT r2 #2): both groups' inverse
    # transforms in ONE irfft op (ops/correlate.py::bank_correlate_multi,
    # APD_MERGED_IRFFT=1 in production). Round 2 measured merged SLOWER
    # (15.8 vs 13.0 ms) — but with the round-3 finding that irfft cost is
    # linear in rows (irfft_batch_probe.py), merging should save the
    # small per-op intercept; the round-2 reading may have been a
    # memoisation artifact. Requires the shared class geometry.
    if shared and os.environ.get("APD_PROBE_MERGED") != "0":
        from audio_pattern_detector_tpu.ops.correlate import (
            bank_correlate_multi,
        )

        @jax.jit
        def p_corr_merged(token):
            sec = tok_mix(token)
            lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
            norm = loudness_normalize_device(sec, lufs)
            spec = section_segment_spectra(norm, first)
            outs = bank_correlate_multi(
                jnp.int32(S), [c for c, _ in gcs], spec
            )
            return token + jnp.float32(1.0) + sum(
                out_tok(corr) for corr, _ in outs
            )

        ladder += [("corr_merged", p_corr_merged)]

    # Bank-split A/B rung: each group's multiply+irfft in SPLITS sub-ops
    # along the bank axis, so per-op intermediates stay small. Probes
    # whether the big-chunk corr regression (production ~0.28 ms/s past
    # 240 s vs ~0.18 at <=120 s while the isolated op stays linear) is a
    # fusion/materialisation size threshold.
    _splits = int(os.environ.get("APD_PROBE_CORR_SPLITS", "0"))
    if _splits > 1:
        from audio_pattern_detector_tpu.ops.correlate import (
            _bank_spec,
            _finalize_correlation,
        )

        @jax.jit
        def p_corr_split(token):
            sec = tok_mix(token)
            lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
            norm = loudness_normalize_device(sec, lufs)
            spec = section_segment_spectra(norm, first)
            acc = jnp.float32(0.0)
            for c, _ in gcs:
                bspec = _bank_spec(c)
                G = bspec.shape[0]
                N, ns, step_ = c.fft_len, c.num_segments, c.step
                parts = []
                bounds = np.linspace(0, G, _splits + 1).astype(int)
                for a, b in zip(bounds[:-1], bounds[1:]):
                    y = jnp.fft.irfft(
                        spec[None, :, :] * bspec[a:b, None, :], n=N, axis=2
                    )
                    parts.append(
                        y[:, :, :step_].reshape(b - a, ns * step_)
                    )
                flat = jnp.concatenate(parts, axis=0)
                off = c.out_offset
                corr = jnp.abs(flat[:, off : off + c.full_len])
                corr, _vl = _finalize_correlation(corr, jnp.int32(S), c)
                acc += out_tok(corr)
            return token + jnp.float32(1.0) + acc

        ladder += [("corr_split", p_corr_split)]
    # Blocked-lean A/B rungs: the block-summary lean tier
    # (ops/peaks.py::greedy_survivors_rederive, APD_BLOCK_LEAN=1 in
    # production) — no (G, L) scored/mask buffers behind dynamic_slice
    # consumers, per-round candidate re-derivation on ±2-halo windows.
    # Bitwise-identical results; probes whether freeing XLA to fuse the
    # mask chain into the block-max reduce harvests the multi-pass HBM
    # traffic (mask stage marginal 4.3 ms at 60 s, 22.4/39.5 ms at
    # 240/480 s).
    if os.environ.get("APD_PROBE_BLOCKED") != "0":
        from audio_pattern_detector_tpu.ops.peaks import (
            greedy_survivors_rederive,
        )

        @jax.jit
        def p_mask_blocked(token):
            sec = tok_mix(token)
            lufs = integrated_loudness_device(sec, jnp.int32(S), loud)
            norm = loudness_normalize_device(sec, lufs)
            spec = section_segment_spectra(norm, first) if shared else None
            acc = jnp.float32(0.0)
            for (kind, m, k_detect, k_verify), (corr, valid_len) in zip(
                metas, correlations(norm, spec)
            ):
                x = jnp.where(
                    jnp.arange(corr.shape[1], dtype=jnp.int32)[None, :]
                    < valid_len,
                    corr,
                    -jnp.inf,
                )
                plateau = long_plateau_present(x, height_min)
                p, h, overflow = greedy_survivors_rederive(
                    corr, valid_len, height_min, m, 16
                )
                acc += out_tok(h) + out_tok(overflow.astype(jnp.float32))
                acc += out_tok(plateau.astype(jnp.float32))
            return token + jnp.float32(1.0) + acc

        @jax.jit
        def p_full_blocked(token):
            sec = tok_mix(token)
            outs = _class_step_jit(
                sec,
                jnp.float32(S),
                loud,
                gcs,
                metas=metas,
                height_min=height_min,
                lean=True,
                blocked=True,
            )
            return token + jnp.float32(1.0) + sum(
                out_tok(o["packed"]) for o in outs
            )

        ladder += [
            ("mask_blocked", p_mask_blocked),
            ("full_lean_step_blocked", p_full_blocked),
        ]

    # The base ladder is cumulative; the pallas rungs are A/B counterparts
    # of `mask`/`full_lean_step`, not further rungs, so marginals are only
    # meaningful within the base ladder.
    base_names = [
        "launch", "loudness", "secfft", "corr", "mask", "full_lean_step",
    ]
    results: dict[str, float] = {}
    prev = 0.0
    for name, fn in ladder:
        t = time_chained(fn)
        results[name] = t
        if name in base_names:
            print(
                f"{name:16s} cumulative {t * 1e3:8.2f} ms   "
                f"marginal {(t - prev) * 1e3:8.2f} ms",
                flush=True,
            )
            prev = t
        else:
            counterpart = {
                "mask_pallas": "mask",
                "full_pallas": "full_lean_step",
                "corr_merged": "corr",
                "corr_split": "corr",
                "mask_blocked": "mask",
                "full_lean_step_blocked": "full_lean_step",
            }[name]
            ref = results[counterpart]
            print(
                f"{name:16s} cumulative {t * 1e3:8.2f} ms   "
                f"vs counterpart {(t - ref) * 1e3:+8.2f} ms",
                flush=True,
            )

    out = {
        "platform": jax.devices()[0].platform,
        "iters": ITERS,
        "repeats": REPEATS,
        "chunk_seconds": CHUNK_SECONDS,
        "x_realtime_full_lean": round(
            CHUNK_SECONDS / results["full_lean_step"], 1
        ),
        "cumulative_s": results,
        "marginal_ms": {
            name: round(
                (results[name] - (results[base_names[i - 1]] if i else 0.0))
                * 1e3,
                3,
            )
            for i, name in enumerate(base_names)
        },
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "bench_results",
        "step_decompose.json"
        if CHUNK_SECONDS == 60
        else f"step_decompose_{CHUNK_SECONDS}.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["marginal_ms"]))


if __name__ == "__main__":
    main()
