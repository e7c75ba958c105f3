"""Same-process alternating A/B: XLA vs Pallas lean tier, STREAMING e2e.

The round-2 full-bench A/B (one window each way) showed the Pallas
candidate scan winning the device step by ~2.5 ms (-11%) but LOSING the
pipelined streaming mode 1200x vs 1287x — inside the tunnel's +-30%
inter-window variance, so not a closed question (VERDICT r2 #2 asks for
a definitive number). This probe removes window drift from the
comparison: both banks live in ONE process and the pipelined streaming
loop (bench.py::_pipelined_loop, the production match.py shape) runs in
ALTERNATING windows [X, P, X, P, ...], so every Pallas window is
bracketed by XLA windows taken minutes apart on the same chip. The
paired per-round delta is the decision number; per-mode medians are
context.

Run in a healthy window:  python scripts/dev/pallas_stream_ab.py
Writes bench_results/pallas_stream_ab.json.
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

import jax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "bench_results",
    ".jax_cache",
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

ROUNDS = int(os.environ.get("APD_AB_ROUNDS", "4"))
ITERS = int(os.environ.get("APD_AB_ITERS", "15"))
DEPTH = int(os.environ.get("APD_AB_DEPTH", "3"))
CHUNK_SECONDS = 60
SR = 8000


def _pcm_grid(a: np.ndarray) -> np.ndarray:
    return (
        np.clip(np.round(a * 32768.0), -32768, 32767) / np.float32(32768.0)
    ).astype(np.float32)


def main() -> None:
    from __graft_entry__ import _make_bank

    import bench

    # Two banks, one process: the ONLY difference is the lean-tier
    # formulation selected at init (env read, trace-time static).
    os.environ.pop("APD_PALLAS", None)
    bank_x, clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=CHUNK_SECONDS
    )
    os.environ["APD_PALLAS"] = "1"
    bank_p, _ = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=CHUNK_SECONDS
    )
    os.environ.pop("APD_PALLAS", None)
    assert not bank_x._pallas and bank_p._pallas

    rng = np.random.default_rng(7)
    n_distinct = 4
    zero_hit = [
        _pcm_grid(0.05 * rng.standard_normal(CHUNK_SECONDS * SR))
        for _ in range(n_distinct)
    ]
    # Hit-bearing variant: one normal clip + one marker tone per chunk
    # (the round-2 hit-path shape — every chunk resolves real survivors).
    normal_audio = next(c.audio for c in clips if "normal" in c.name)
    marker_audio = next(c.audio for c in clips if "marker" in c.name)
    hits = []
    for i in range(n_distinct):
        a = 0.05 * rng.standard_normal(CHUNK_SECONDS * SR)
        o1 = (7 + 11 * i) * SR
        o2 = (31 + 6 * i) * SR
        a[o1 : o1 + len(normal_audio)] += normal_audio
        a[o2 : o2 + len(marker_audio)] += marker_audio
        hits.append(_pcm_grid(a))

    def warm(bank, chunks) -> None:
        prev = None
        for i in range(2):
            bank.process_chunk(chunks[i % n_distinct], prev)
            prev = chunks[i % n_distinct]

    results: dict[str, list[float]] = {}
    deltas: dict[str, list[float]] = {}
    for stream_name, chunks in (("zero_hit", zero_hit), ("hit", hits)):
        warm(bank_x, chunks)
        warm(bank_p, chunks)
        for r in range(ROUNDS):
            pair = {}
            # Alternate within-pair order: a window drifting during the
            # pair would otherwise bias the second-run variant.
            order = (("xla", bank_x), ("pallas", bank_p))
            if r % 2:
                order = order[::-1]
            for tag, bank in order:
                elapsed, dets, _ = bench._pipelined_loop(
                    bank,
                    lambda i: chunks[i % n_distinct],
                    ITERS,
                    chunks[-1],
                    DEPTH,
                )
                x = ITERS * CHUNK_SECONDS / elapsed
                pair[tag] = x
                results.setdefault(f"{stream_name}_{tag}", []).append(x)
                print(
                    f"{stream_name:9s} round {r} {tag:6s} "
                    f"{x:7.1f}x  ({dets} detections)",
                    flush=True,
                )
            deltas.setdefault(stream_name, []).append(
                (pair["pallas"] - pair["xla"]) / pair["xla"]
            )

    out: dict = {
        "platform": jax.devices()[0].platform,
        "rounds": ROUNDS,
        "iters": ITERS,
        "depth": DEPTH,
        "medians": {
            k: round(statistics.median(v), 1) for k, v in results.items()
        },
        "spread": {
            k: [round(min(v), 1), round(max(v), 1)]
            for k, v in results.items()
        },
        "paired_delta_pallas_vs_xla": {
            k: [round(d, 4) for d in v] for k, v in deltas.items()
        },
        "paired_delta_median": {
            k: round(statistics.median(v), 4) for k, v in deltas.items()
        },
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "bench_results",
        "pallas_stream_ab.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["paired_delta_median"]))


if __name__ == "__main__":
    main()
