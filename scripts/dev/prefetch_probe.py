"""Dispatch asynchrony + d2h queueing probe (docs/scaling.md rule 9).

Three measurements on the flagship lean step (64-clip bank, 60 s chunk):

1. dispatch asynchrony — N independent programs dispatched without
   fetching: per-call dispatch time ~0.1-2 ms and pipelined throughput
   ~25 ms/chunk proves dispatch is async and the device pipeline is not
   the streaming bottleneck.
2. depth-K streaming WITHOUT prefetch — collect blocks ~40 ms even at
   depth 2: the d2h request (issued only when np.asarray blocks) queues
   behind the already-dispatched next program.
3. depth-K streaming WITH dispatch-time copy_to_host_async (the shipped
   behaviour, models/bank.py::_host_prefetch) — depth-2 reaches the
   pure-exec floor.

Measured 2026-08-17 (mixed-health window, same-window A/Bs):
  dispatch/call 0.1-2.4 ms; 8-deep pipelined exec 25.0 ms/chunk
  no prefetch:   depth0 ~73  depth1 ~52  depth2 ~51 ms/chunk
  with prefetch: depth0 ~74  depth1 ~39  depth2 ~28 ms/chunk

Run in a healthy window: python scripts/dev/prefetch_probe.py
"""
from __future__ import annotations

import os
import sys
import time
from collections import deque

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.models.bank import _class_step_jit

    sr, cs = 8000, 60
    bank, _ = _make_bank(num_normal=32, num_marker=32, chunk_seconds=cs)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    metas = bank._metas[sw]
    S = cls["section_len"]
    gcs = tuple((g.corr, g.verify) for g in cls["groups"])
    rng = np.random.default_rng(7)
    chunks = [
        (
            np.clip(np.round(0.05 * rng.standard_normal(cs * sr) * 32768), -32768, 32767)
            / np.float32(32768.0)
        ).astype(np.float32)
        for _ in range(4)
    ]

    # 1. dispatch asynchrony on device-resident sections
    secs = [
        jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
        for _ in range(8)
    ]

    def step(sec):
        return _class_step_jit(
            sec, jnp.float32(S), cls["loud"], gcs,
            metas=metas, height_min=bank.height_min, lean=True,
        )

    outs = step(secs[0])
    jax.block_until_ready([o["packed"] for o in outs])
    t0 = time.perf_counter()
    pend = [step(s) for s in secs]
    t_disp = time.perf_counter() - t0
    jax.block_until_ready([[o["packed"] for o in p] for p in pend])
    t_total = time.perf_counter() - t0
    print(
        f"1. dispatch: {t_disp / len(secs) * 1e3:.2f} ms/call; "
        f"8-deep pipelined exec {t_total / len(secs) * 1e3:.1f} ms/chunk",
        flush=True,
    )

    # 2./3. depth-K streaming through the real engine (prefetch is shipped
    # behaviour; pass APD_NO_PREFETCH-like comparison by monkeypatching).
    prev = None
    for i in range(2):
        bank.process_chunk(chunks[i % 4], prev)
        prev = chunks[i % 4]

    import audio_pattern_detector_tpu.models.bank as bank_mod

    real_prefetch = bank_mod._host_prefetch

    def run(depth: int, prefetch: bool, n: int = 15) -> float:
        nonlocal prev
        bank_mod._host_prefetch = real_prefetch if prefetch else (lambda f: None)
        try:
            pend: deque = deque()
            t0 = time.perf_counter()
            for i in range(n):
                c = chunks[i % 4]
                if depth == 0:
                    bank.process_chunk(c, prev)
                else:
                    pend.append(bank.dispatch_chunk(c, prev))
                    if len(pend) > depth:
                        bank.collect_chunk(pend.popleft())
                prev = c
            while pend:
                bank.collect_chunk(pend.popleft())
            return (time.perf_counter() - t0) / n * 1e3
        finally:
            bank_mod._host_prefetch = real_prefetch

    for label, prefetch in (("2. no prefetch ", False), ("3. with prefetch", True)):
        msgs = [f"depth{d} {run(d, prefetch):.1f}" for d in (0, 1, 2)]
        print(f"{label}: " + "  ".join(msgs) + " ms/chunk", flush=True)


if __name__ == "__main__":
    main()
