"""A/B the round-5 flag-free file-mode default: 60 s scan-batched launches
(_auto_perf_plan: chunk 60, balanced batch up to 8) vs the pre-round-5
big-chunk policy (chunk 120, serial depth-3 pipeline).

Same-process, order-alternating windows (docs/scaling.md measurement
protocol) over the exact _measure_default_cli scenario: a 64-min WAV, 32
normal WAV patterns + 32 sine markers, match_pattern end to end (pattern
load + bank init amortised out by measuring the scan call only after a
shared warm phase — the policies share every compiled program class with
the bench's stream-batch/chunk120 rungs).

Run on the real chip:  python scripts/dev/auto_batch_ab.py
(CPU: APD_PROBE_CPU=1   windows: APD_PROBE_WINDOWS=N)
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time
import wave as wave_mod

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax

if os.environ.get("APD_PROBE_CPU") == "1":
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

SR = 8000
WINDOWS = int(os.environ.get("APD_PROBE_WINDOWS", "5"))


def main() -> None:
    from __graft_entry__ import _make_bank
    from audio_pattern_detector_tpu.match import match_pattern

    chunk_seconds = 60
    _bank, clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=chunk_seconds
    )
    rng = np.random.default_rng(7)
    raw = [0.05 * rng.standard_normal(chunk_seconds * SR) for _ in range(4)]
    # Hit-bearing: one normal + one marker hit so the identity gate spans
    # the verify/greedy path under both policies.
    raw[0][3 * SR : 3 * SR + len(clips[0].audio)] += clips[0].audio
    raw[1][11 * SR : 11 * SR + len(clips[-1].audio)] += 0.8 * clips[-1].audio
    n_chunks = int(os.environ.get("APD_BENCH_DEFAULT_CHUNKS", "64"))
    audio = np.concatenate(
        [np.asarray(raw[i % 4], dtype=np.float64) for i in range(n_chunks)]
    )

    with tempfile.TemporaryDirectory(prefix="apd_ab_") as td:
        audio_path = os.path.join(td, "stream.wav")
        with wave_mod.open(audio_path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(
                np.round(audio * 32768).clip(-32768, 32767).astype("<i2").tobytes()
            )
        pattern_files = []
        for i, clip in enumerate(clips[:32]):
            p = os.path.join(td, f"normal_{i}.wav")
            with wave_mod.open(p, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SR)
                w.writeframes(
                    np.round(clip.audio * 32767)
                    .clip(-32768, 32767)
                    .astype("<i2")
                    .tobytes()
                )
            pattern_files.append(p)
        for i in range(32):
            p = os.path.join(td, f"marker_{i}.apd.toml")
            with open(p, "w") as f:
                f.write(
                    "[clip]\n"
                    'source = "sine"\n'
                    f"frequency_hz = {900.0 + 7.0 * i}\n"
                    "duration_seconds = 0.25\n"
                    "amplitude = 1.0\n\n"
                    "[verification]\n"
                    'strategy = "marker_tone"\n'
                )
            pattern_files.append(p)

        def run(new_policy: bool) -> tuple[float, object]:
            t0 = time.perf_counter()
            res, total_time = match_pattern(
                audio_path,
                pattern_files,
                accumulate_results=True,
                **(
                    {"chunk_seconds_auto_perf": True}
                    if new_policy
                    else {"seconds_per_chunk": 120}
                ),
            )
            return total_time / (time.perf_counter() - t0), res

        # Warm both policies twice (fresh-detector residual warm-up,
        # bench.py _measure_default_cli note) + identity gate.
        _, r_old = run(False)
        _, r_old = run(False)
        _, r_new = run(True)
        _, r_new = run(True)
        n_hits = sum(len(v) for v in r_new.values())
        assert n_hits > 0, "probe audio must carry real detections"
        assert r_new == r_old, "auto-batched results diverge from chunk120"
        print(f"identity gate: {n_hits} detections, equal", file=sys.stderr)

        old_x, new_x = [], []
        for w in range(WINDOWS):
            order = (False, True) if w % 2 == 0 else (True, False)
            for pol in order:
                x, _ = run(pol)
                (new_x if pol else old_x).append(x)
            print(
                f"window {w}: old={old_x[-1]:.0f}x new={new_x[-1]:.0f}x",
                flush=True,
            )
        import json

        # The drift-cancelling statistic is the PAIRED per-window ratio
        # (both variants ran adjacently, order flipped per window) — the
        # overall medians mix windows at different health levels.
        ratios = [n / o for o, n in zip(old_x, new_x)]
        print(
            json.dumps(
                {
                    "old_chunk120_median_x": round(statistics.median(old_x), 1),
                    "new_autobatch_median_x": round(statistics.median(new_x), 1),
                    "paired_ratio_median": round(statistics.median(ratios), 3),
                    "paired_ratios": [round(r, 3) for r in ratios],
                    "old_runs": [round(x) for x in old_x],
                    "new_runs": [round(x) for x in new_x],
                    "detections": n_hits,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
