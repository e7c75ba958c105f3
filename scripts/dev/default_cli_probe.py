"""Decompose the default-CLI metric's wall time (BENCH r2: 322x).

Rebuilds _measure_default_cli's exact scenario (64-min WAV, 32 normal WAV
patterns + 32 sine markers, auto-perf chunk sizing) and times each stage:
pattern loading, detector/bank init, and the streaming scan — twice, so
warm-vs-cold separates compile/upload cost from steady-state cost.

Run on the real chip:  python scripts/dev/default_cli_probe.py
(CPU: APD_PROBE_CPU=1)
"""

from __future__ import annotations

import os
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

# Share bench.py's persistent compilation cache so repeated probe runs
# skip the 20-60 s/class first compiles.
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
    _bank, clips = _make_bank(
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
    n_chunks = int(os.environ.get("APD_BENCH_DEFAULT_CHUNKS", "64"))
    audio = np.concatenate([chunks[i % len(chunks)] for i in range(n_chunks)])

    from audio_pattern_detector_tpu.match import (
        _auto_perf_plan,
        _load_pattern_clips,
    )
    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

    with tempfile.TemporaryDirectory(prefix="apd_probe_") as td:
        audio_path = os.path.join(td, "stream.wav")
        with wave_mod.open(audio_path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                np.round(audio * 32768).clip(-32768, 32767).astype("<i2").tobytes()
            )
        pattern_files = []
        for i, clip in enumerate(clips[:32]):
            p = os.path.join(td, f"normal_{i}.wav")
            with wave_mod.open(p, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
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

        for run in range(3):
            t0 = time.perf_counter()
            pattern_clips = _load_pattern_clips(pattern_files, sr)
            t_load = time.perf_counter() - t0

            t0 = time.perf_counter()
            cs, sb = _auto_perf_plan(audio_path, pattern_clips, sr)
            t_auto = time.perf_counter() - t0

            t0 = time.perf_counter()
            det = AudioPatternDetector(
                audio_clips=pattern_clips,
                seconds_per_chunk=cs,
            )
            t_init = time.perf_counter() - t0

            from audio_pattern_detector_tpu.utils.clip import AudioStream
            from audio_pattern_detector_tpu.match import _WavFileStreamWrapper

            t0 = time.perf_counter()
            wrapper = _WavFileStreamWrapper(audio_path, sr)
            stream = AudioStream(
                name="stream", audio_stream=wrapper, sample_rate=sr
            )
            _, total_time = det.find_clip_in_audio(
                stream,
                accumulate_results=False,
                pipeline_depth=3,
                stream_batch=sb,
            )
            wrapper.close()
            t_scan = time.perf_counter() - t0
            elapsed = t_load + t_auto + t_init + t_scan
            print(
                f"run{run}: chunk={cs}s batch={sb} load={t_load:.2f}s auto={t_auto:.2f}s "
                f"init={t_init:.2f}s scan={t_scan:.2f}s "
                f"total={elapsed:.2f}s -> {total_time / elapsed:.0f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
