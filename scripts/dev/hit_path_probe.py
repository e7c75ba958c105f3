"""Diagnose the hit-bearing path's cost: which flags fire and what runs.

BENCH r2 measured hit_bearing 93x vs zero-hit streaming ~1100x in the
same window — ~0.6 s/chunk of extra work when every chunk carries one
normal and one marker hit. This probe rebuilds the bench's hit chunks
and counts, per chunk: flagged rows by kind (host flag 1 vs device
flag 2), host-fallback invocations, row reruns, and class reruns, with
host-side wall time for each path. Platform-independent (flags are
data-driven): run on CPU.
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

import numpy as np


def main() -> None:
    from __graft_entry__ import _make_bank

    sr = 8000
    chunk_seconds = 60
    bank, clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=chunk_seconds
    )

    rng = np.random.default_rng(7)
    chunks = [
        (
            np.clip(
                np.round(0.05 * rng.standard_normal(chunk_seconds * sr) * 32768),
                -32768,
                32767,
            )
            / np.float32(32768.0)
        ).astype(np.float32)
        for _ in range(4)
    ]

    def make_hit_chunk(base: np.ndarray) -> np.ndarray:
        c = base.copy()
        normal_clip = clips[0].audio
        marker_clip = clips[32].audio
        c[10 * sr : 10 * sr + len(normal_clip)] += 0.8 * normal_clip
        c[30 * sr : 30 * sr + len(marker_clip)] += 0.7 * marker_clip
        return (
            np.clip(np.round(c * 32768), -32768, 32767) / np.float32(32768.0)
        ).astype(np.float32)

    hit_chunks = [make_hit_chunk(c) for c in chunks]

    stats = {
        "host_rows": 0,
        "device_rows": 0,
        "row_reruns": 0,
        "class_reruns": 0,
        "host_s": 0.0,
        "row_s": 0.0,
        "class_s": 0.0,
        "flag_names": [],
    }

    orig_host = bank._host_fallback
    orig_row = bank._full_tier_row
    orig_class = bank._full_tier_packed
    orig_resolve = bank.resolve_flagged_rows

    def host_fallback(g, ci, raw):
        t0 = time.perf_counter()
        r = orig_host(g, ci, raw)
        stats["host_s"] += time.perf_counter() - t0
        stats["host_rows"] += 1
        stats["flag_names"].append(("host", g.names[ci]))
        return r

    def full_tier_row(sw, gi, ci, raw, **kw):
        t0 = time.perf_counter()
        r = orig_row(sw, gi, ci, raw, **kw)
        stats["row_s"] += time.perf_counter() - t0
        stats["row_reruns"] += 1
        return r

    def full_tier_packed(sw, raw, **kw):
        t0 = time.perf_counter()
        r = orig_class(sw, raw, **kw)
        stats["class_s"] += time.perf_counter() - t0
        stats["class_reruns"] += 1
        return r

    def resolve(sw, flagged, raw):
        for gi, ci, host in flagged:
            g = bank.classes[sw]["groups"][gi]
            stats["flag_names"].append(
                ("flag1" if host else "flag2", g.names[ci])
            )
            if host:
                stats["host_rows"] += 0  # counted in host_fallback
            else:
                stats["device_rows"] += 1
        return orig_resolve(sw, flagged, raw)

    bank._host_fallback = host_fallback
    bank._full_tier_row = full_tier_row
    bank._full_tier_packed = full_tier_packed
    bank.resolve_flagged_rows = resolve

    prev = None
    for i in range(2):  # warm
        bank.process_chunk(hit_chunks[i % 4], prev)
        prev = hit_chunks[i % 4]

    for k in stats:
        stats[k] = type(stats[k])()
    stats["host_s"] = stats["row_s"] = stats["class_s"] = 0.0

    t0 = time.perf_counter()
    dets = 0
    for i in range(4):
        out = bank.process_chunk(hit_chunks[i % 4], prev)
        dets += sum(len(v) for v in out.values())
        prev = hit_chunks[i % 4]
    total = time.perf_counter() - t0

    from collections import Counter

    print(f"4 hit chunks: {total:.2f}s total, {dets} detections")
    print(
        f"host_rows={stats['host_rows']} ({stats['host_s']:.2f}s)  "
        f"row_reruns={stats['row_reruns']} ({stats['row_s']:.2f}s)  "
        f"class_reruns={stats['class_reruns']} ({stats['class_s']:.2f}s)"
    )
    print("flag breakdown:", Counter(k for k, _ in stats["flag_names"]))
    print("flagged clips:", Counter(n for _, n in stats["flag_names"]))


if __name__ == "__main__":
    main()
