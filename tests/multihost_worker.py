"""Worker process for the multi-host sharded-detector test.

Each of two processes owns 2 virtual CPU devices; the mesh is
stream(2) x time(2) spanning both processes over the distributed runtime
(the CPU stand-in for DCN). Every process feeds only ITS stream's rows
and checks its results against the serial engine on the same audio.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

from __future__ import annotations

import io
import os
import sys


def main() -> None:
    proc = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc
    )
    assert jax.process_count() == 2
    assert jax.local_device_count() == 2

    import numpy as np

    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
    from audio_pattern_detector_tpu.parallel.mesh import make_mesh
    from audio_pattern_detector_tpu.parallel.sequence import ShardedDetector
    from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream

    sr = 8000
    chunk_seconds = 2
    rng = np.random.default_rng(0)  # identical clip on both processes
    clip = AudioClip(
        name="c",
        audio=(0.4 * rng.standard_normal(sr)).astype(np.float32),
        sample_rate=sr,
    )

    mesh = make_mesh({"stream": 2, "time": 2})
    sd = ShardedDetector([clip], mesh, chunk_seconds=chunk_seconds)
    assert sd.process_count == 2

    # Two slabs (8 s at time=2 x 2 s chunks) to exercise the carried
    # lookback across a multi-host slab boundary; per-process audio with
    # embeds at process-specific offsets, one straddling slab 2.
    rng_p = np.random.default_rng(100 + proc)
    audio = (0.01 * rng_p.standard_normal(8 * sr)).astype(np.float32)
    for off in (1.0 + proc * 0.5, 5.25):
        o = int(off * sr)
        audio[o : o + sr] += clip.audio

    res = sd.detect(audio[None, :])  # this process's ONE local stream

    det = AudioPatternDetector(
        audio_clips=[clip], seconds_per_chunk=chunk_seconds
    )
    peaks, _ = det.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), sr)
    )
    assert res["c"][0] == sorted(peaks["c"]), (proc, res, peaks)
    assert len(res["c"][0]) >= 2, (proc, res)
    print(f"MULTIHOST-OK {proc} {res['c'][0]}", flush=True)

    # ── Multi-host MultiStreamSession: each process feeds its own 2
    # local stream slots over a stream(4) mesh spanning both processes
    # (serve --mesh-stream's DCN scale-out form). Rounds run in lockstep
    # (both processes dispatch each round); results must equal the
    # serial engine per local stream. ──
    from audio_pattern_detector_tpu.models.multistream import (
        MultiStreamSession,
    )

    ms_mesh = make_mesh({"stream": 4})
    session = MultiStreamSession(det, n_streams=2, mesh=ms_mesh)
    chunk_n = chunk_seconds * sr
    # Per-process, per-stream audio: embeds at distinct offsets (one in
    # chunk 0, one straddling into chunk 2's lookback region).
    streams = []
    for si in range(2):
        rng_s = np.random.default_rng(200 + 10 * proc + si)
        a = (0.01 * rng_s.standard_normal(3 * chunk_n)).astype(np.float32)
        for off in (0.5 + 0.25 * si + 0.1 * proc, 3.75):
            o = int(off * sr)
            a[o : o + sr] += clip.audio
        streams.append(a)

    got: list[list[float]] = [[], []]
    for r in range(3):
        out = session.feed(
            [s[r * chunk_n : (r + 1) * chunk_n] for s in streams]
        )
        for si in range(2):
            got[si].extend(out[si].get("c", []))
    for si in range(2):
        peaks_s, total_s = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(streams[si].tobytes()), sr)
        )
        assert sorted(got[si]) == sorted(peaks_s["c"]), (
            proc, si, got[si], peaks_s,
        )
        assert len(got[si]) >= 2, (proc, si, got)
        assert session.total_time(si) == total_s
    print(f"MULTIHOST-MS-OK {proc}", flush=True)


if __name__ == "__main__":
    main()
