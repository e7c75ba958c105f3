"""On-chip decomposition of the capped wide-rerun program's cost.

The hit-bearing path's residual cost is one capped wide class rerun per
hit-dense chunk (~160 ms measured via hit_path_probe on 2026-08-17).
This probe times the wide program at several candidate-lane caps and
isolates the stages unique to wide (flat top_k at the cap width,
parallel greedy fixed point over cap^2 conflicts, two-tier verify) so
the cap choice is measured, not guessed.

Method per project memory: single outer jit threading a token, sync via
a real np.asarray d2h, fresh random sections per repeat to defeat the
server's identical-launch memoisation; calibrate against the known-cost
flat top_k probe.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax

if os.environ.get("APD_PROBE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

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

REPEATS = 8


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import _class_step_jit

    sr = 8000
    chunk_seconds = 60
    bank, clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=chunk_seconds
    )
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]

    rng = np.random.default_rng(11)

    def make_section(i: int) -> np.ndarray:
        base = (0.05 * rng.standard_normal(S)).astype(np.float32)
        normal_clip = clips[0].audio
        marker_clip = clips[32].audio
        base[10 * sr : 10 * sr + len(normal_clip)] += 0.8 * normal_clip
        base[30 * sr : 30 * sr + len(marker_clip)] += 0.7 * marker_clip
        return np.clip(np.round(base * 32768), -32768, 32767).astype(
            np.float32
        ) / np.float32(32768.0)

    sections = [make_section(i) for i in range(REPEATS)]
    group_consts = tuple(
        (g.corr, g.verify) for g in cls["groups"]
    )

    def run_once(section: np.ndarray, metas) -> float:
        t0 = time.perf_counter()
        outs = _class_step_jit(
            jnp.asarray(section),
            jnp.float32(S),
            cls["loud"],
            group_consts,
            metas=metas,
            height_min=bank.height_min,
            lean=True,
            wide=True,
        )
        for o in outs:
            np.asarray(o["packed"])
        return time.perf_counter() - t0

    for cap in (256, 512, 1024, 2048):
        metas = tuple(
            (kind, m, min(kd, cap), kv)
            for kind, m, kd, kv in bank._metas[sw]
        )
        # warm/compile
        run_once(sections[0], metas)
        times = [run_once(s, metas) for s in sections]
        times.sort()
        med = times[len(times) // 2]
        print(
            f"cap={cap:5d}: median {med * 1e3:7.1f} ms  "
            f"min {times[0] * 1e3:7.1f}  max {times[-1] * 1e3:7.1f}",
            flush=True,
        )

    # Calibration: lean program on the same sections (known ~25 ms).
    metas_lean = bank._metas[sw]

    def run_lean(section: np.ndarray) -> float:
        t0 = time.perf_counter()
        outs = _class_step_jit(
            jnp.asarray(section),
            jnp.float32(S),
            cls["loud"],
            group_consts,
            metas=metas_lean,
            height_min=bank.height_min,
            lean=True,
        )
        for o in outs:
            np.asarray(o["packed"])
        return time.perf_counter() - t0

    run_lean(sections[0])
    times = sorted(run_lean(s) for s in sections)
    print(
        f"lean (calibration): median {times[len(times) // 2] * 1e3:7.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()


def device_resident() -> None:
    """Variant: sections pre-uploaded; times launch+compute+d2h only —
    the cost of a rerun that reuses the lean launch's device section."""
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import _class_step_jit

    sr = 8000
    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=60)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    rng = np.random.default_rng(11)

    def make_section(i: int) -> np.ndarray:
        base = (0.05 * rng.standard_normal(S)).astype(np.float32)
        base[10 * sr : 10 * sr + sr] += 0.8 * clips[0].audio
        m = len(clips[32].audio)
        base[30 * sr : 30 * sr + m] += 0.7 * clips[32].audio
        return np.clip(np.round(base * 32768), -32768, 32767).astype(
            np.float32
        ) / np.float32(32768.0)

    dev_sections = [jax.device_put(make_section(i)) for i in range(REPEATS)]
    jax.block_until_ready(dev_sections)
    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])

    for cap in (512, 1024):
        metas = tuple(
            (kind, m, min(kd, cap), kv) for kind, m, kd, kv in bank._metas[sw]
        )

        def run_once(sec) -> float:
            t0 = time.perf_counter()
            outs = _class_step_jit(
                sec, jnp.float32(S), cls["loud"], group_consts,
                metas=metas, height_min=bank.height_min,
                lean=True, wide=True,
            )
            for o in outs:
                np.asarray(o["packed"])
            return time.perf_counter() - t0

        run_once(dev_sections[0])
        times = sorted(run_once(s) for s in dev_sections)
        print(
            f"device-resident cap={cap:5d}: median {times[len(times)//2]*1e3:7.1f} ms  "
            f"min {times[0]*1e3:7.1f}",
            flush=True,
        )
