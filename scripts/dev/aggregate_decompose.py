"""Where do the aggregate modes lose vs the device asymptote? (round 4)

BENCH_r03: batched(B=4) 1474x, stream_batch(8) 2088x, multi_stream8
2081x, serve8 1754x -- all below single-stream chunk120 (2339x) and the
device asymptote (~2836x). Per docs/scaling.md rule 5 the batch device
program is linear in rows, so the gap must be host-side or pipelining.

This probe replays the exact find_clip_in_array loop (B chunks per
vmapped launch, 3 batches in flight, eager draining) with per-stage
wall timers around every host phase:

  sections  - _raw_section assembly (concat prev tail + chunk)
  pack      - try_pack_pcm16 / row packing + np.stack
  upload    - jnp.asarray h2d
  launch    - step_jit call (async dispatch)
  wait      - np.asarray block on the decision payload
  unpack    - unpack_group + python result-dict loop
  fold      - peaks_to_times conversion

plus end-to-end wall, so (sum of stages) vs wall exposes both where
host time goes and how much of it the pipeline fails to hide.

Run: python scripts/dev/aggregate_decompose.py  [APD_PROBE_B=4]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import jax

from __graft_entry__ import _make_bank

B = int(os.environ.get("APD_PROBE_B", "4"))
N_BATCHES = int(os.environ.get("APD_PROBE_BATCHES", "8"))
CHUNK_S = int(os.environ.get("APD_PROBE_CHUNK_SECONDS", "60"))
MODE = os.environ.get("APD_PROBE_MODE", "vmap")  # vmap | scan
SR = 8000

T = defaultdict(float)


class timer:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        T[self.name] += time.perf_counter() - self.t0


def main() -> None:
    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=CHUNK_S)
    from audio_pattern_detector_tpu.models import bank as bank_mod
    from audio_pattern_detector_tpu.models.bank import (
        _host_prefetch,
        _split_fused,
        unpack_group,
    )
    from audio_pattern_detector_tpu.ops.packing import try_pack_pcm16

    rng = np.random.default_rng(7)
    n_distinct = 4
    chunks = [
        (
            np.clip(
                np.round(0.05 * rng.standard_normal(CHUNK_S * SR) * 32768),
                -32768,
                32767,
            )
            / np.float32(32768.0)
        ).astype(np.float32)
        for _ in range(n_distinct)
    ]

    import jax.numpy as jnp

    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])
    metas = bank._metas[sw]

    # Ablation switches: skip host phases to find which one the pipeline
    # fails to hide. PREPACK reuses pre-built host payloads (sections+pack
    # excluded); PREUPLOAD additionally reuses pre-staged device arrays
    # (upload excluded) -- the remaining wall is the pure pipeline floor.
    PREPACK = os.environ.get("APD_PROBE_PREPACK") == "1"
    PREUPLOAD = os.environ.get("APD_PROBE_PREUPLOAD") == "1"
    prebuilt: list = []

    def dispatch_batch(batch, prev_tail):
        """find_clip_in_array's dispatch with stage timers."""
        b = len(batch)
        with timer("sections"):
            raws = []
            n_valids = np.zeros(b, dtype=np.int32)
            for bi, chunk in enumerate(batch):
                prev = batch[bi - 1] if bi > 0 else prev_tail
                raw = bank._raw_section(sw, chunk, prev)
                raws.append(raw)
                n_valids[bi] = len(raw)
        if PREPACK:
            if len(prebuilt) < 4:
                sections = np.empty((b, S), dtype=np.float32)
                for bi, raw in enumerate(raws):
                    sections[bi, : len(raw)] = raw
                    if len(raw) < S:
                        sections[bi, len(raw):] = 0.0
                packs = [try_pack_pcm16(sections[bi]) for bi in range(b)]
                payload_np = np.stack(packs)
                nv_np = n_valids.astype(np.float32)
                if PREUPLOAD:
                    prebuilt.append(
                        (jnp.asarray(payload_np), jnp.asarray(nv_np))
                    )
                else:
                    prebuilt.append((payload_np, nv_np))
            payload_src, nv_src = prebuilt[len(prebuilt) % 4 - 1]
            # Rule 10 (docs/scaling.md): the runtime memoises executions
            # by (program, input VALUES). Reused payloads need a
            # never-repeating perturbation; a fractional n_valid shift
            # in (0, 0.5) leaves the integer validity mask unchanged.
            dispatch_batch.ctr += 1
            frac = np.float32(1e-4 * (dispatch_batch.ctr % 4000))
            if PREUPLOAD:
                payload = payload_src
                n_valid_dev = jnp.asarray(np.asarray(nv_src) - frac)
            else:
                with timer("upload"):
                    payload = jnp.asarray(payload_src)
                    n_valid_dev = jnp.asarray(np.asarray(nv_src) - frac)
        else:
            with timer("pack"):
                sections = np.empty((b, S), dtype=np.float32)
                for bi, raw in enumerate(raws):
                    sections[bi, : len(raw)] = raw
                    if len(raw) < S:
                        sections[bi, len(raw):] = 0.0
                packs = [try_pack_pcm16(sections[bi]) for bi in range(b)]
                assert all(p is not None for p in packs)
                payload_np = np.stack(packs)
            with timer("upload"):
                payload = jnp.asarray(payload_np)
                n_valid_dev = jnp.asarray(n_valids.astype(np.float32))
        step_jit = (
            bank_mod._class_step_scan_packed_jit
            if MODE == "scan"
            else bank_mod._class_step_batch_packed_jit
        )
        with timer("launch"):
            flat = step_jit(
                payload,
                n_valid_dev,
                cls["loud"],
                group_consts,
                metas=metas,
                height_min=bank.height_min,
            )
            _host_prefetch(flat)
        return flat, raws, b

    dispatch_batch.ctr = 0

    def collect_batch(handle):
        flat, raws, b = handle
        with timer("wait"):
            flat_np = np.asarray(flat)
        with timer("unpack"):
            results = [dict() for _ in range(b)]
            for gi, (g, packed) in enumerate(
                zip(cls["groups"], _split_fused(flat_np, cls["groups"]))
            ):
                pos, sel, host_fb, needs_full = unpack_group(packed, g.k_verify)
                for bi in range(b):
                    for ci, name in enumerate(g.names):
                        assert not (host_fb[bi, ci] or needs_full[bi, ci])
                        results[bi][name] = [
                            int(p) for p in pos[bi, ci][sel[bi, ci]]
                        ]
        return results

    def ready(handle):
        return handle[0].is_ready()

    def run_once() -> float:
        prev_tail = None
        pending = []
        t0 = time.perf_counter()
        for i in range(N_BATCHES):
            batch = [chunks[(i * B + j) % n_distinct] for j in range(B)]
            pending.append(dispatch_batch(batch, prev_tail))
            prev_tail = batch[-1]
            while len(pending) > 1 and ready(pending[0]):
                collect_batch(pending.pop(0))
            if len(pending) > 3:
                collect_batch(pending.pop(0))
        while pending:
            collect_batch(pending.pop(0))
        return time.perf_counter() - t0

    # warm
    run_once()
    T.clear()

    walls = []
    for _ in range(3):
        walls.append(run_once())

    total_audio = 3 * N_BATCHES * B * CHUNK_S
    wall = sum(walls)
    out = {
        "platform": jax.devices()[0].platform,
        "B": B,
        "mode": MODE,
        "chunk_seconds": CHUNK_S,
        "x_realtime": round(total_audio / wall, 1),
        "wall_per_batch_ms": round(1e3 * wall / (3 * N_BATCHES), 2),
    }
    for k, v in sorted(T.items()):
        out[f"{k}_ms_per_batch"] = round(1e3 * v / (3 * N_BATCHES), 2)
    host_sum = sum(
        v for k, v in T.items() if k not in ("wait",)
    )
    out["host_nonwait_ms_per_batch"] = round(1e3 * host_sum / (3 * N_BATCHES), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
