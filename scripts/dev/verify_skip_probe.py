"""Measure the candidate-free verify skip (lax.cond in _lean_tail).

The lean tail's verify compute is exact-zero-impact when no survivor
lane is alive (sel = valive & accept), so round 5 wraps it in a
scalar-predicate lax.cond. This probe times the fused class step on
(a) noise-only sections — cond SKIPS verify (the common marker-watch
case), and (b) hit-bearing sections — cond TAKES the branch (old cost
path + branch overhead). Compare (a) against the same-window
step_decompose full-step numbers to see the skip's win, and (b) to
bound the cond overhead on the hit path.

Run on TPU: python scripts/dev/verify_skip_probe.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_bank

SR = 8000
CHUNK_S = 60
ITERS = int(os.environ.get("APD_PROBE_ITERS", "15"))
REPEATS = int(os.environ.get("APD_PROBE_REPEATS", "3"))


def main() -> None:
    from audio_pattern_detector_tpu.models.bank import _class_step_fused_jit

    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=CHUNK_S)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])

    rng = np.random.default_rng(1)
    noise = (0.05 * rng.standard_normal(S)).astype(np.float32)
    hit = noise.copy()
    hit[10 * SR : 10 * SR + SR] += 0.8 * clips[0].audio
    hit[30 * SR : 30 * SR + len(clips[-1].audio)] += 0.7 * clips[-1].audio

    def run(section, pallas):
        return _class_step_fused_jit(
            jnp.asarray(section),
            jnp.float32(S),
            cls["loud"],
            group_consts,
            metas=bank._metas[sw],
            height_min=bank.height_min,
            pallas=pallas,
        )

    out = {"platform": jax.devices()[0].platform, "iters": ITERS}
    for name, section, pallas in (
        ("noise_xla", noise, False),
        ("hit_xla", hit, False),
        ("noise_pallas", noise, True),
        ("hit_pallas", hit, True),
    ):
        jax.block_until_ready(run(section, pallas))  # compile+warm
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            r = None
            for _ in range(ITERS):
                r = run(section, pallas)
            jax.block_until_ready(r)
            times.append(1e3 * (time.perf_counter() - t0) / ITERS)
        out[f"{name}_ms"] = round(statistics.median(times), 2)
        print(f"{name}: {out[f'{name}_ms']} ms", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
