"""What does the TCP serving stack cost on top of raw multi-stream rounds?

End-to-end measurement of PatternServer (serve.py) on the flagship
64-clip bank: N loopback TCP clients blast 16-bit WAV audio
faster-than-realtime; the probe reports the aggregate realtime factor
from first byte sent to last ``end`` event received — socket ingest +
header walk + int16 decode + batched device rounds + JSONL emission,
the whole serving path. Compare against the raw MultiStreamSession
numbers (scripts/dev/multistream_probe.py, ~1700x aggregate pipelined):
the difference is the serving layer's overhead.

Run in a healthy window: python scripts/dev/serve_probe.py
Env: APD_PROBE_WIDTHS=1,4,8  APD_PROBE_SECONDS=240  APD_PROBE_DEPTH=2
"""

from __future__ import annotations

import json
import os
import socket
import struct
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from __graft_entry__ import _make_bank
from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
from audio_pattern_detector_tpu.serve import PatternServer

SR = 8000
CHUNK_SECONDS = 60
WIDTHS = [int(w) for w in os.environ.get("APD_PROBE_WIDTHS", "1,4,8").split(",")]
STREAM_SECONDS = int(os.environ.get("APD_PROBE_SECONDS", "240"))
DEPTH = int(os.environ.get("APD_PROBE_DEPTH", "2"))


def wav_payload(audio: np.ndarray) -> bytes:
    data = (
        np.clip(np.round(audio * 32768.0), -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def client(port: int, payload: bytes, out: list, i: int) -> None:
    sock = socket.create_connection(("127.0.0.1", port), timeout=120)
    sock.sendall(payload)
    sock.shutdown(socket.SHUT_WR)
    sock.settimeout(600)
    buf = b""
    while True:
        d = sock.recv(1 << 16)
        if not d:
            break
        buf += d
    sock.close()
    events = [json.loads(line) for line in buf.decode().splitlines()]
    assert events[-1]["type"] == "end", events[-1]
    out[i] = events


def measure(clips, bank, width: int) -> dict:
    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=CHUNK_SECONDS)
    det._bank = bank
    # Prebuilt detector: every width shares the per-class compiles (only
    # the width-B batch program differs).
    server = PatternServer(
        detector=det,
        max_streams=width,
        timestamp_format="ms",
        pipeline_depth=DEPTH,
    )
    server.warmup()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.address[1]

    rng = np.random.default_rng(11)
    audio = np.asarray(
        np.round(0.05 * rng.standard_normal(STREAM_SECONDS * SR) * 32768)
        / 32768,
        dtype=np.float32,
    )
    payload = wav_payload(audio)

    def fleet() -> float:
        results: list = [None] * width
        threads = [
            threading.Thread(target=client, args=(port, payload, results, i))
            for i in range(width)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=900)
            assert not t.is_alive()
        wall = time.perf_counter() - t0
        for ev in results:
            assert ev is not None
            assert ev[-1]["total_time_ms"] == STREAM_SECONDS * 1000
        return wall

    # Two passes: the second reuses recycled slots with everything warm,
    # separating steady-state serving cost from first-window effects
    # (shared-chip variance shows up as cold/warm disagreement).
    from audio_pattern_detector_tpu.models.bank import (
        dispatch_phase_seconds,
    )

    cold = fleet()
    snap0 = dict(server.phase_seconds)
    dsnap0 = dict(dispatch_phase_seconds)
    rounds0 = server.rounds_dispatched
    rows0 = server.rows_dispatched
    warm = fleet()
    phases = {
        k: round(v - snap0.get(k, 0.0), 3)
        for k, v in server.phase_seconds.items()
    }
    dphases = {
        k: round(v - dsnap0.get(k, 0.0), 3)
        for k, v in dispatch_phase_seconds.items()
    }
    rounds = server.rounds_dispatched - rounds0
    rows = server.rows_dispatched - rows0
    server.shutdown()
    thread.join(timeout=30)

    total_audio = width * STREAM_SECONDS
    return {
        "width": width,
        "wall_cold_s": round(cold, 2),
        "wall_warm_s": round(warm, 2),
        "aggregate_x_realtime": round(total_audio / warm, 1),
        "per_stream_x_realtime": round(STREAM_SECONDS / warm, 1),
        "warm_rounds": rounds,
        "warm_rows": rows,
        "warm_rows_per_round": round(rows / max(rounds, 1), 2),
        "warm_phase_seconds": phases,
        "warm_dispatch_stage_seconds": dphases,
    }


def main() -> None:
    bank, clips = _make_bank(32, 32, CHUNK_SECONDS)
    rows = []
    for width in WIDTHS:
        row = measure(clips, bank, width)
        print(json.dumps(row), flush=True)
        rows.append(row)
    print(json.dumps({"probe": "serve", "depth": DEPTH, "rows": rows}))


if __name__ == "__main__":
    main()
