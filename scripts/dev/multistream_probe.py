"""Where does multi-stream serving saturate the chip?

Pipelined wall-clock of MultiStreamSession rounds at stream widths
B = 1/2/4/8/16 (64-clip bank, 60 s chunks, depth-3 rounds in flight),
reporting aggregate and per-stream realtime factors. The question the
numbers answer: does the vmapped batch program scale sub-linearly with
B (device saturated — aggregate flat) or near-linearly (launch-bound —
aggregate grows with B), i.e. how many live stations one chip serves
before per-station headroom decays.

Run in a healthy window: python scripts/dev/multistream_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from __graft_entry__ import _make_bank
from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
from audio_pattern_detector_tpu.models.multistream import MultiStreamSession

ROUNDS = int(os.environ.get("APD_PROBE_ROUNDS", "12"))
DEPTH = int(os.environ.get("APD_PROBE_DEPTH", "3"))
WIDTHS = [
    int(w) for w in os.environ.get("APD_PROBE_WIDTHS", "1,2,4,8,16").split(",")
]


def measure(clips, bank, width: int, sr: int, chunk_seconds: int) -> float:
    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=chunk_seconds)
    det._bank = bank
    session = MultiStreamSession(det, n_streams=width)
    rng = np.random.default_rng(7)
    chunks = [
        np.asarray(
            np.round(0.05 * rng.standard_normal(chunk_seconds * sr) * 32768)
            / 32768,
            dtype=np.float32,
        )
        for _ in range(3)
    ]

    def round_chunks(r: int) -> list[np.ndarray]:
        return [chunks[(r + i) % len(chunks)] for i in range(width)]

    # Warm: one synchronous round compiles the width-B batch program.
    session.feed(round_chunks(0))

    inflight: list = []
    t0 = time.perf_counter()
    for r in range(ROUNDS):
        inflight.append(session.dispatch(round_chunks(r)))
        while len(inflight) > DEPTH or (
            inflight and session.round_ready(inflight[0])
        ):
            session.collect(inflight.pop(0))
    while inflight:
        session.collect(inflight.pop(0))
    elapsed = time.perf_counter() - t0
    return ROUNDS * width * chunk_seconds / elapsed


def main() -> None:
    sr, chunk_seconds = 8000, 60
    bank, clips = _make_bank(
        num_normal=32, num_marker=32, chunk_seconds=chunk_seconds
    )
    out = {}
    for width in WIDTHS:
        agg = measure(clips, bank, width, sr, chunk_seconds)
        out[f"B{width}"] = {
            "aggregate_x": round(agg, 1),
            "per_stream_x": round(agg / width, 1),
        }
        print(json.dumps({f"B{width}": out[f"B{width}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
