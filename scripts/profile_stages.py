"""Per-stage device-time profile of the flagship 64-clip per-chunk program.

Measures each stage of the class step (loudness -> correlate -> peaks ->
verify) as a separately jitted program on the real section shapes, plus the
fused lean step, and writes bench_results/stage_times.json. This is the
measured roofline evidence for docs/scaling.md: stage times vs the HBM
traffic each stage must move.

Run standalone in a healthy tunnel window (serialize with other TPU work):
    python scripts/profile_stages.py            # real chip
    APD_PROFILE_CPU=1 python scripts/profile_stages.py   # CPU smoke
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("APD_PROFILE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from audio_pattern_detector_tpu.ops.correlate import bank_correlate
from audio_pattern_detector_tpu.ops.loudness import (
    integrated_loudness_device,
    loudness_normalize_device,
)
from audio_pattern_detector_tpu.ops.peaks import (
    find_peaks_device,
    find_peaks_device_fast,
)
from audio_pattern_detector_tpu.ops.verify import verify_marker, verify_normal

_BIG = np.int32(2**30)
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "bench_results",
    # CPU smoke runs must not clobber the on-chip measurement record.
    "stage_times_cpu.json"
    if os.environ.get("APD_PROFILE_CPU") == "1"
    else "stage_times.json",
)


ITERS = int(os.environ.get("APD_PROFILE_ITERS", "20"))
REPEATS = int(os.environ.get("APD_PROFILE_REPEATS", "3"))


def _time_fn(fn, *args, iters=ITERS, repeats=REPEATS) -> float:
    """Median wall seconds per call: dispatch `iters` back-to-back, block once.

    CAUTION: on the remote tunnel backend, block_until_ready on the last
    output has been observed to return before queued predecessors complete,
    under-reporting wildly. Prefer `_time_fn_sync` (upper bound incl.
    launch overhead) and the dependency-chained fused measurement (lower
    bound, launch overhead amortised) for trustworthy numbers.
    """
    out = fn(*args)
    jax.block_until_ready(out)  # warm/compile
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples))


def _time_fn_sync(fn, *args, iters=ITERS, repeats=REPEATS) -> float:
    """Median wall seconds per call, blocking on EVERY call: real execution
    plus per-launch overhead (what a synchronous caller pays)."""
    jax.block_until_ready(fn(*args))  # warm/compile
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples))


def _time_chained(step, iters=ITERS, repeats=REPEATS) -> float:
    """THE trustworthy timer on the tunnel backend.

    ``step(token) -> token`` must thread a data dependency from each
    iteration's output into the next iteration's input (add a
    provably-zero-at-runtime delta derived from the token to a real
    input). Repeated identical calls appear to be memoised server-side and
    block_until_ready returns early, so only a dependency chain forces N
    real sequential executions.
    """
    token = jnp.float32(0.0)
    token = jax.block_until_ready(step(token))  # warm/compile
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        tok = token
        for _ in range(iters):
            tok = step(tok)
        jax.block_until_ready(tok)
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples))


def _delta(token):
    """0.0 at runtime, but data-dependent so XLA cannot fold it away."""
    return jnp.where(jnp.isnan(token), 1.0, 0.0)


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import _class_step_jit

    sr = 8000
    chunk_seconds = 60
    height_min = 0.25
    bank, _ = _make_bank(num_normal=32, num_marker=32, chunk_seconds=chunk_seconds)

    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    rng = np.random.default_rng(7)
    section = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
    n_valid = jnp.float32(S)

    loud_fn = jax.jit(
        lambda s, n, lc: loudness_normalize_device(
            s, integrated_loudness_device(s, n, lc)
        )
    )
    corr_fn = jax.jit(bank_correlate)

    @partial(jax.jit, static_argnames=("m", "k_detect", "k_verify"))
    def peaks_fn(corr, valid_len, m, k_detect, k_verify):
        # Production fast path (fused short-run mask).
        cand, _ = find_peaks_device_fast(corr, valid_len, height_min, m, k_detect)
        half = (2 * m - 1) // 2
        keep = (
            cand.alive
            & ~(cand.pos + half > valid_len + 5)
            & ~(cand.pos - half < -5)
        )
        score = jnp.where(keep, -cand.pos, -_BIG)
        sv, _ = jax.lax.top_k(score, k_verify)
        return -sv, sv > -_BIG

    @partial(jax.jit, static_argnames=("m", "k_detect"))
    def peaks_scan_fn(corr, valid_len, m, k_detect):
        # The general scan-based mask, for before/after comparison.
        return find_peaks_device(corr, valid_len, height_min, m, k_detect)

    marker_fn = jax.jit(verify_marker)
    normal_fn = jax.jit(verify_normal)

    result: dict = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "section_len": int(S),
        "chunk_seconds": chunk_seconds,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "stages": {},
    }

    @jax.jit
    def loud_chain(token):
        out = loud_fn(section + _delta(token), n_valid, cls["loud"])
        return jnp.sum(out)  # full reduction: nothing can be DCE'd

    t_loud = _time_chained(loud_chain)
    norm = jax.block_until_ready(loud_fn(section, n_valid, cls["loud"]))
    result["stages"]["loudness_normalize"] = {
        "seconds_per_chunk": t_loud,
        # FFT-conv K-weighting: rfft+irfft over S plus gating reductions.
        "hbm_bytes_est": int(6 * S * 4),
    }

    stage_total = t_loud
    for g, meta in zip(cls["groups"], bank._metas[sw]):
        kind, m, k_detect, k_verify = meta
        label = f"{kind}_G{g.corr.bank_size if hasattr(g.corr, 'bank_size') else len(g.names)}_m{m}"
        G = len(g.names)
        L = g.corr.full_len

        gc = g.corr
        gv = g.verify

        @jax.jit
        def corr_chain(token, gc=gc):
            c, _ = corr_fn(norm + _delta(token), n_valid, gc)
            return jnp.sum(c)

        t_corr = _time_chained(corr_chain)
        corr, valid_len = jax.block_until_ready(corr_fn(norm, n_valid, gc))

        # MXU alternative: 'full' correlation as lax.conv (no kernel flip,
        # pad m-1 both sides). HIGHEST ~= 3-pass bf16 ~= f32 precision.
        bank_np = g.clips_np

        @partial(jax.jit, static_argnames=("prec",))
        def conv_chain(token, kern, prec, m=m):
            from jax import lax

            out = lax.conv_general_dilated(
                (norm + _delta(token))[None, None, :],
                kern[:, None, :],
                window_strides=(1,),
                padding=[(m - 1, m - 1)],
                precision=getattr(lax.Precision, prec),
            )[0]
            return jnp.sum(jnp.abs(out))

        kern = jnp.asarray(bank_np)
        t_conv = {}
        # Opt-in (APD_PROFILE_CONV=1): the large-kernel conv compile can
        # hang the tunnel runtime, starving the primary stage numbers.
        if os.environ.get("APD_PROFILE_CONV") == "1":
            for prec in ("HIGHEST", "DEFAULT"):
                try:
                    t_conv[prec] = _time_chained(
                        partial(conv_chain, kern=kern, prec=prec)
                    )
                except Exception as e:  # noqa: BLE001 — probe only
                    print(
                        f"[profile] conv {label} {prec} failed: {e}",
                        file=sys.stderr,
                    )
                    t_conv[prec] = None

        @jax.jit
        def peaks_chain(token, corr=corr, m=m, kd=k_detect, kv=k_verify):
            vp, alive = peaks_fn(corr + _delta(token), valid_len, m, kd, kv)
            return (jnp.sum(vp) + jnp.sum(alive)).astype(jnp.float32)

        t_peaks = _time_chained(peaks_chain)

        @jax.jit
        def peaks_scan_chain(token, corr=corr, m=m, kd=k_detect):
            cand = peaks_scan_fn(corr + _delta(token), valid_len, m, kd)
            return (
                jnp.sum(cand.pos) + jnp.sum(cand.alive) + jnp.sum(cand.height)
            ).astype(jnp.float32)

        t_peaks_scan = _time_chained(peaks_scan_chain)
        vpos, valive = jax.block_until_ready(
            peaks_fn(corr, valid_len, m, k_detect, k_verify)
        )
        if kind == "marker":

            @jax.jit
            def verify_chain(token, gv=gv):
                acc = marker_fn(norm + _delta(token), vpos, valive, gv)
                return jnp.sum(acc).astype(jnp.float32)

        else:

            @jax.jit
            def verify_chain(token, gv=gv):
                acc, sim, r = normal_fn(corr + _delta(token), vpos, valive, gv)
                return (jnp.sum(acc) + jnp.sum(sim) + jnp.sum(r)).astype(
                    jnp.float32
                )

        t_verify = _time_chained(verify_chain)

        result["stages"][f"correlate_{label}"] = {
            "seconds_per_chunk": t_corr,
            # write (G, L) f32 + FFT intermediates (~3x read-write of that)
            "hbm_bytes_est": int(4 * G * L * 4),
            "conv_highest_seconds": t_conv.get("HIGHEST"),
            "conv_default_seconds": t_conv.get("DEFAULT"),
        }
        result["stages"][f"peaks_{label}"] = {
            "seconds_per_chunk": t_peaks,
            # fused short-run mask + top_k: ~2 passes over (G, L) f32
            "hbm_bytes_est": int(2 * G * L * 4),
            "scan_mask_seconds": t_peaks_scan,  # pre-optimization variant
        }
        result["stages"][f"verify_{label}"] = {
            "seconds_per_chunk": t_verify,
            "hbm_bytes_est": int(G * k_verify * (2 * m) * 4),
        }
        stage_total += t_corr + t_peaks + t_verify

    # Isolated probes of the sequential constructs inside the step.
    from audio_pattern_detector_tpu.ops.peaks import (
        PeakCandidates,
        greedy_distance_filter,
        select_candidates,
        short_run_local_maxima_mask,
    )

    probe_corr, probe_valid = jax.block_until_ready(
        jax.jit(bank_correlate)(norm, n_valid, cls["groups"][0].corr)
    )
    pm = cls["groups"][0].clip_len
    pkd = bank._metas[sw][0][2]

    @jax.jit
    def topk_chain(token):
        x = probe_corr + _delta(token)
        h, p = jax.lax.top_k(x, pkd)
        return jnp.sum(h) + jnp.sum(p).astype(jnp.float32)

    result["probe_topk_seconds"] = _time_chained(topk_chain)

    from audio_pattern_detector_tpu.ops.peaks import topk_sparse

    @jax.jit
    def topk_sparse_chain(token):
        x = probe_corr + _delta(token)
        h, p = topk_sparse(x, 16)
        return jnp.sum(h) + jnp.sum(p).astype(jnp.float32)

    result["probe_topk_sparse_seconds"] = _time_chained(topk_sparse_chain)

    @jax.jit
    def mask_chain(token):
        x = probe_corr + _delta(token)
        mask = short_run_local_maxima_mask(x) & (x >= height_min)
        return jnp.sum(mask).astype(jnp.float32)

    result["probe_mask_seconds"] = _time_chained(mask_chain)

    cand0 = jax.block_until_ready(
        jax.jit(
            lambda x: select_candidates(
                x, short_run_local_maxima_mask(x) & (x >= height_min), pkd
            )
        )(probe_corr)
    )

    @jax.jit
    def greedy_chain(token):
        c = PeakCandidates(
            cand0.pos, cand0.height + _delta(token), cand0.alive, cand0.overflow
        )
        return jnp.sum(greedy_distance_filter(c, pm)).astype(jnp.float32)

    result["probe_greedy_seconds"] = _time_chained(greedy_chain)

    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])
    fused_fn = lambda s, n: _class_step_jit(  # noqa: E731
        s,
        n,
        cls["loud"],
        group_consts,
        metas=bank._metas[sw],
        height_min=bank.height_min,
        lean=True,
    )
    t_fused_sync = _time_fn_sync(fused_fn, section, n_valid)
    t_fused_async = _time_fn(fused_fn, section, n_valid)

    # Dependency-chained: iteration i+1's input depends on iteration i's
    # output, forcing truly sequential executions with ONE final sync —
    # per-launch overhead amortises away, leaving device compute time.
    @jax.jit
    def chained_step(sec, n, token):
        delta = jnp.where(jnp.isnan(token), 1.0, 0.0)  # always 0.0 at runtime
        outs = fused_fn(sec + delta, n)
        return outs, outs[0]["packed"][0, 0]

    token = jnp.float32(0.0)
    outs, token = chained_step(section, n_valid, token)
    jax.block_until_ready(token)  # warm
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        tok = token
        for _ in range(ITERS):
            outs, tok = chained_step(section, n_valid, tok)
        jax.block_until_ready(tok)
        samples.append((time.perf_counter() - t0) / ITERS)
    t_fused_chain = float(np.median(samples))

    # Per-launch overhead floor: a trivial program, per-call synced.
    tiny = jax.jit(lambda a: a + 1.0)
    t_launch = _time_fn_sync(tiny, jnp.zeros(8, jnp.float32))

    result["fused_lean_step_seconds"] = t_fused_sync
    result["fused_async_seconds"] = t_fused_async
    result["fused_chained_seconds"] = t_fused_chain
    result["launch_overhead_seconds"] = t_launch
    result["stage_sum_seconds"] = stage_total
    result["fused_x_realtime"] = chunk_seconds / t_fused_sync
    result["fused_chained_x_realtime"] = chunk_seconds / t_fused_chain
    for name, st in result["stages"].items():
        st["gbps_est"] = round(st["hbm_bytes_est"] / st["seconds_per_chunk"] / 1e9, 1)

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
