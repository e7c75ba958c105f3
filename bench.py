"""Throughput benchmark: audio-hours scanned per second per chip.

Flagship configuration from BASELINE.md: 8 kHz mono audio scanned against a
64-clip bank (32 normal 1 s clips + 32 marker tones) on one chip. Reports
the realtime factor (seconds of audio processed per wall-clock second) in
steady state, including host->device transfer and host-side result
conversion, excluding compilation (warmup chunks).

Prints exactly one JSON line:
  {"metric": "realtime_factor_64clip", "value": N, "unit": "x_realtime",
   "vs_baseline": N/1000}
(baseline: the >=1000x realtime target from BASELINE.md; the reference CPU
implementation publishes no throughput numbers.)

Statistics: every metric is sampled over N>=3 measurement windows within
the run; the reported `<mode>_x_realtime` is the MEDIAN and
`<mode>_x_realtime_spread` is [min, max] across samples. Per-run medians
are persisted under "runs" in bench_results/tpu_measurement.json. The
headline `value` is the best mode's median from THIS run — historical
maxima are never folded into reported numbers (the shared chip swings
±30% between healthy windows; a best-of-history headline would claim
more precision than one run measures).

Resilience: the single-chip tunnel alternates between healthy and degraded
windows; a degraded window fails medium/large programs with UNIMPLEMENTED
and poisons the process. Strategy:
  * each attempt runs in a fresh child process;
  * the child first runs a tiny canary program + device->host transfer —
    if even that fails the window is degraded and the child exits fast
    with a distinct code so the parent sleeps longer before retrying;
  * attempts spread over a time budget (APD_BENCH_BUDGET_S, default 90 min)
    with escalating sleeps instead of a fixed 4x180 s;
  * every successful measurement is persisted to
    bench_results/tpu_measurement.json; if all live attempts fail but a
    measurement from an earlier healthy window exists, that (real,
    on-chip) number is reported with its timestamp.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import subprocess
import sys
import time

RESULT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_results", "tpu_measurement.json"
)
CANARY_FAILED_RC = 3

# metric name -> list of samples (x realtime), accumulated through the run
_SAMPLES: dict[str, list[float]] = {}
# non-realtime auxiliary metrics (reported verbatim, e.g. p99 seconds)
_EXTRA: dict[str, float] = {}


def _pcm16_bytes(arr) -> bytes:
    """f32 samples -> little-endian int16 PCM bytes, the engine's x32768
    quantisation convention (ops/packing.py PCM_SCALE). The ONE place the
    bench quantises — every WAV the bench writes or streams goes through
    here so all metrics measure the same input convention."""
    import numpy as np

    return np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2").tobytes()


def _wav_write(path: str, arr, sr: int) -> None:
    """Write f32 samples as a 16-bit mono WAV file."""
    import wave as wave_mod

    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(_pcm16_bytes(arr))


def _wav_payload(arr, sr: int) -> bytes:
    """f32 samples -> complete in-memory 16-bit mono RIFF/WAVE bytes (the
    stdin/serve wire format)."""
    import struct

    data = _pcm16_bytes(arr)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _rec(name: str, value: float) -> None:
    if value > 0:
        _SAMPLES.setdefault(name, []).append(value)


def _stats(name: str) -> tuple[float, float, float, int]:
    """(median, min, max, n) over the recorded samples for a metric."""
    s = _SAMPLES.get(name, [])
    if not s:
        return 0.0, 0.0, 0.0, 0
    return statistics.median(s), min(s), max(s), len(s)



def _resample_if_spread(
    name: str,
    fn,
    spread_limit: float = 1.8,
    max_extra: int = 2,
    secondary: bool = False,
) -> None:
    """When the recorded spread says a degraded tunnel period polluted a
    metric (max/min > spread_limit), take up to ``max_extra`` more
    samples so the median re-centres on the healthy majority. Honest
    statistics: every sample stays recorded and the reported
    median/spread cover ALL of them — this only adds data where the
    existing data disagrees with itself (the 2026-08-19 run's chunk120
    spread [1165, 2157] is the motivating case). ``secondary`` metrics
    swallow sampling errors (they must not fail the run)."""
    for _ in range(max_extra):
        _med, lo, hi, n = _stats(name)
        if n == 0 or lo <= 0 or hi / max(lo, 1e-9) <= spread_limit:
            break
        if secondary:
            try:
                _rec(name, fn())
            except Exception as e:  # noqa: BLE001 — secondary metric only
                print(f"[bench] {name} resample failed: {e}", file=sys.stderr)
                break
        else:
            _rec(name, fn())


def _sample(
    name: str,
    fn,
    base: int = 3,
    spread_limit: float = 1.8,
    max_extra: int = 2,
) -> None:
    """Record ``base`` samples of ``fn()``, then re-sample on a polluted
    spread (see _resample_if_spread)."""
    for _ in range(base):
        _rec(name, fn())
    _resample_if_spread(name, fn, spread_limit, max_extra)


def _canary() -> None:
    """Degraded-window probe, escalating to a correlation-shaped program.

    Degraded tunnel windows pass tiny single-op jits but fail the first
    device->host transfer of medium/large programs, so a sum-probe alone
    gives false healthy signals. Probe both tiers: a tiny reduction, then
    a ~1M-point rfft·irfft round trip with a full f32 d2h — the same shape
    of work (and transfer) the flagship bench does per chunk.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.arange(4096, dtype=jnp.float32)
    y = float(np.asarray(jax.jit(lambda a: jnp.sum(a * a))(x)))
    want = float(np.sum(np.arange(4096.0) ** 2))
    assert abs(y - want) < 1e-4 * want, (y, want)

    n = 1 << 20
    sig = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    out = np.asarray(jax.jit(lambda a: jnp.fft.irfft(jnp.fft.rfft(a), n))(sig))
    assert out.shape == (n,)
    assert np.allclose(out[:64], np.asarray(sig[:64]), atol=1e-3)


# ── Per-family window hygiene (VERDICT r4 #3) ──────────────────────────
# One bench run spans multiple ~20-40 min tunnel windows, so a start-only
# canary lets later metric families record degraded-window numbers that
# read as real. Each family is bracketed by a TRIPWIRE — a salted
# ~1M-point FFT + full d2h round trip (the same shape of work the
# flagship chunk step does) — and tagged healthy only when both the
# before and after tripwires were fast. A family whose pre-tripwire is
# degraded WAITS (bounded, shared budget) for the window to heal before
# measuring.
_HEALTH: dict = {}
_TRIPWIRE: dict = {"fn": None, "salt": int(time.time_ns() % 100000) * 1000}
_TRIPWIRE_THRESH_MS = float(os.environ.get("APD_BENCH_TRIPWIRE_MS", "2000"))
_HEAL_BUDGET = {"s": float(os.environ.get("APD_BENCH_HEAL_BUDGET_S", "360"))}


def _tripwire_ms() -> float:
    """Time one salted FFT+d2h round trip (ms). Salting matters: the
    tunnel runtime memoises executions by (program, inputs), so a
    repeated identical probe would time a cache hit even in a degraded
    window (docs/scaling.md rule 10)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1 << 20
    if _TRIPWIRE["fn"] is None:
        _TRIPWIRE["fn"] = jax.jit(
            lambda a: jnp.fft.irfft(jnp.fft.rfft(a), n)
        )
        _TRIPWIRE["salt"] += 1
        sig = jnp.asarray(
            np.random.default_rng(_TRIPWIRE["salt"])
            .standard_normal(n)
            .astype(np.float32)
        )
        np.asarray(_TRIPWIRE["fn"](sig))  # compile outside the timer
    _TRIPWIRE["salt"] += 1
    sig = jnp.asarray(
        np.random.default_rng(_TRIPWIRE["salt"])
        .standard_normal(n)
        .astype(np.float32)
    )
    t0 = time.perf_counter()
    np.asarray(_TRIPWIRE["fn"](sig))
    return 1e3 * (time.perf_counter() - t0)


_FAM_STATE: dict = {}


def _fam_begin(name: str) -> None:
    """Open a metric family: probe the window; if degraded, wait (30 s
    steps, bounded by the run's shared heal budget) for it to recover
    before measuring."""
    try:
        tw = _tripwire_ms()
        while tw >= _TRIPWIRE_THRESH_MS and _HEAL_BUDGET["s"] > 0:
            print(
                f"[bench] {name}: window degraded (tripwire "
                f"{tw:.0f} ms) — waiting 30 s "
                f"({_HEAL_BUDGET['s']:.0f} s heal budget left)",
                file=sys.stderr,
            )
            sys.stderr.flush()
            time.sleep(30)
            _HEAL_BUDGET["s"] -= 30
            tw = _tripwire_ms()
        _FAM_STATE[name] = tw
    except Exception as e:  # noqa: BLE001 — the guard must never kill a run
        print(f"[bench] {name}: tripwire failed: {e}", file=sys.stderr)
        _FAM_STATE[name] = float("inf")


def _fam_end(name: str) -> None:
    """Close a metric family: probe again and tag it healthy only if
    BOTH brackets were fast — a window that flipped mid-family shows up
    as healthy=false in window_health, never as a silently polluted
    number."""
    try:
        after = _tripwire_ms()
    except Exception as e:  # noqa: BLE001
        print(f"[bench] {name}: tripwire failed: {e}", file=sys.stderr)
        after = float("inf")
    before = _FAM_STATE.pop(name, float("inf"))
    _HEALTH[name] = {
        "healthy": bool(
            before < _TRIPWIRE_THRESH_MS and after < _TRIPWIRE_THRESH_MS
        ),
        "tripwire_ms": [round(min(before, 1e9), 1), round(min(after, 1e9), 1)],
    }


def _persist_partial(streaming_x: float, detections: int) -> None:
    import jax

    if jax.devices()[0].platform == "cpu":
        return  # the persisted fallback must be an on-chip number
    # Never clobber a complete measurement with a partial one.
    if os.path.exists(RESULT_PATH):
        try:
            with open(RESULT_PATH) as f:
                if not json.load(f).get("partial"):
                    return
        except Exception:
            pass
    result = {
        "metric": "realtime_factor_64clip",
        "value": round(streaming_x, 1),
        "unit": "x_realtime",
        "vs_baseline": round(streaming_x / 1000.0, 3),
        "streaming_x_realtime": round(streaming_x, 1),
        "platform": jax.devices()[0].platform,
        "detections": detections,
        "partial": True,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(RESULT_PATH), exist_ok=True)
    with open(RESULT_PATH, "w") as f:
        json.dump(result, f, indent=1)


def _pipelined_loop(bank, get_chunk, n_iters, prev, cap: int):
    """The production streaming shape (match.py / find_clip_in_audio):
    up to ``cap`` chunks in flight, eager in-order collection of ready
    results, blocking drain at the cap. Returns (elapsed_s, detections,
    last_chunk)."""
    from collections import deque

    def ready(disp) -> bool:
        return all(
            getattr(f, "is_ready", lambda: False)() for _sw, f, _r in disp
        )

    dets = 0
    pend: deque = deque()

    def drain() -> None:
        nonlocal dets
        out = bank.collect_chunk(pend.popleft())
        dets += sum(len(v) for v in out.values())

    t0 = time.perf_counter()
    for i in range(n_iters):
        chunk = get_chunk(i)
        pend.append(bank.dispatch_chunk(chunk, prev))
        while len(pend) > 1 and ready(pend[0]):
            drain()
        if len(pend) > cap:
            drain()
        prev = chunk
    while pend:
        drain()
    return time.perf_counter() - t0, dets, prev


def _measure_default_cli(
    clips: list, chunks: list, sr: int, chunk_seconds: int
) -> None:
    """Throughput of the flag-free CLI path: match_pattern on a WAV file
    with default settings (file-mode auto-perf chunk sizing engaged),
    pattern files loaded from disk exactly as `audio-pattern-detector-tpu
    match file.wav --pattern-file ...` would."""
    import tempfile

    import numpy as np

    from audio_pattern_detector_tpu.match import match_pattern

    n_chunks = int(os.environ.get("APD_BENCH_DEFAULT_CHUNKS", "64"))
    audio = np.concatenate([chunks[i % len(chunks)] for i in range(n_chunks)])

    with tempfile.TemporaryDirectory(prefix="apd_bench_") as td:
        audio_path = os.path.join(td, "stream.wav")
        _wav_write(audio_path, audio, sr)
        pattern_files = []
        for i, clip in enumerate(clips[:32]):  # normal clips as WAVs
            p = os.path.join(td, f"normal_{i}.wav")
            # Shared _pcm16_bytes quantisation (the engine's int16
            # convention) keeps the patterns loaded back bit-identical
            # to the hits summed into the stream.
            _wav_write(p, clip.audio, sr)
            pattern_files.append(p)
        for i in range(32):  # marker tones as .apd.toml sine patterns
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

        def one_run() -> float:
            t0 = time.perf_counter()
            _, total_time = match_pattern(
                audio_path,
                pattern_files,
                accumulate_results=False,
                chunk_seconds_auto_perf=True,
            )
            elapsed = time.perf_counter() - t0
            return total_time / elapsed

        # Warm twice: measured on-chip, the first run through a fresh
        # detector instance pays residual backend warm-up well beyond the
        # shared compile cache (29.7 -> 12.3 -> 4.9 s across runs in one
        # process; scripts/dev/default_cli_probe.py), so a single warm run
        # still leaves ~2-3x on the first measured run.
        one_run()
        one_run()
        _sample("default_cli", one_run)


def _measure_serve(clips, bank, chunks, sr: int, chunk_seconds: int) -> None:
    """The TCP serving stack end to end (VERDICT r2 #7): N loopback
    clients stream 16-bit WAV through serve.py's selector loop and read
    their JSONL events back; aggregate audio-seconds per wall-second from
    first byte sent to last `end` received. Unlike multi_stream8 (which
    drives MultiStreamSession directly), this prices socket ingest, the
    WAV header walk, int16 decode, slot scheduling, and event emission."""
    import socket
    import threading

    import numpy as np

    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
    from audio_pattern_detector_tpu.serve import PatternServer

    width = int(os.environ.get("APD_BENCH_SERVE_STREAMS", "8"))
    stream_seconds = int(
        os.environ.get("APD_BENCH_SERVE_SECONDS", str(4 * chunk_seconds))
    )

    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=chunk_seconds)
    det._bank = bank
    server = PatternServer(
        detector=det, max_streams=width, timestamp_format="ms", pipeline_depth=2
    )
    server.warmup()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.address[1]

    audio = np.concatenate(
        [chunks[i % len(chunks)] for i in range(stream_seconds // chunk_seconds)]
    )
    payload = _wav_payload(audio, sr)

    def client(out: list, i: int) -> None:
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
        assert events[-1]["total_time_ms"] == stream_seconds * 1000
        out[i] = events

    def fleet() -> float:
        results: list = [None] * width
        threads = [
            threading.Thread(target=client, args=(results, i))
            for i in range(width)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=900)
            assert not t.is_alive()
        wall = time.perf_counter() - t0
        assert all(ev is not None for ev in results)
        return width * stream_seconds / wall

    try:
        fleet()  # warm (first-connection slot assignment + width-B program)
        _sample(f"serve{width}", fleet)
    finally:
        server.shutdown()
        thread.join(timeout=30)


def _measure_serve_capacity(
    clips, bank, chunks, sr: int, chunk_seconds: int
) -> "int | None":
    """Serving-capacity ladder (VERDICT r3 #3): N = 32/64/128 loopback
    clients through the TCP stack (auto-tiled rounds: 16-row launches of
    one compiled program). Records serve{N}_x_realtime per rung and
    returns the capacity figure: the largest N that sustained >= 1x
    realtime per stream (aggregate >= N) with every client completing."""
    import socket
    import threading

    import numpy as np

    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
    from audio_pattern_detector_tpu.serve import PatternServer

    steps = [
        int(s)
        for s in os.environ.get("APD_BENCH_CAPACITY_STEPS", "32,64,128").split(",")
        if s
    ]
    stream_seconds = 2 * chunk_seconds
    audio = np.concatenate(
        [chunks[i % len(chunks)] for i in range(stream_seconds // chunk_seconds)]
    )
    payload = _wav_payload(audio, sr)

    capacity: "int | None" = None
    for width in steps:
        det = AudioPatternDetector(
            audio_clips=clips, seconds_per_chunk=chunk_seconds
        )
        det._bank = bank
        server = PatternServer(
            detector=det, max_streams=width, timestamp_format="ms",
            pipeline_depth=2,
        )
        server.warmup()
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.address[1]

        def client(out: list, i: int, t0: float) -> None:
            sock = socket.create_connection(("127.0.0.1", port), timeout=300)
            sock.sendall(payload)
            sock.shutdown(socket.SHUT_WR)
            sock.settimeout(900)
            buf = b""
            while True:
                d = sock.recv(1 << 16)
                if not d:
                    break
                buf += d
            done = time.perf_counter() - t0
            sock.close()
            events = [json.loads(line) for line in buf.decode().splitlines()]
            assert events[-1]["type"] == "end", events[-1]
            assert events[-1]["total_time_ms"] == stream_seconds * 1000
            out[i] = done

        p99s: list[float] = []

        def fleet() -> float:
            results: list = [None] * width
            t0 = time.perf_counter()
            threads = [
                threading.Thread(target=client, args=(results, i, t0))
                for i in range(width)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=1200)
                assert not t.is_alive()
            wall = time.perf_counter() - t0
            assert all(r is not None for r in results)
            # p99 client completion: the straggler bound — how long the
            # worst-served station waits for its full result set (the
            # per-event latency bound under the offline drain: every
            # event a client will ever get has arrived by this time).
            # Nearest-rank p99: ceil(0.99 n) — at n <= 100 this IS the
            # max, which is the point (a single straggler must show).
            import math

            p99s.append(
                sorted(results)[
                    min(width - 1, math.ceil(0.99 * width) - 1)
                ]
            )
            return width * stream_seconds / wall

        try:
            fleet()  # warm (first-connection slot assignment)
            _sample(f"serve{width}", fleet, base=2)
            agg = _stats(f"serve{width}")[0]
            if p99s:
                _EXTRA[f"serve{width}_p99_wall_s"] = round(
                    statistics.median(p99s[1:] or p99s), 2
                )
            if agg >= width:
                capacity = width
        except Exception as e:  # noqa: BLE001 — ladder rung is secondary
            print(f"[bench] serve{width} rung failed: {e}", file=sys.stderr)
            break
        finally:
            server.shutdown()
            thread.join(timeout=30)
    return capacity


def _measure_serve_live(
    clips, bank, hit_chunks, sr: int, chunk_seconds: int
) -> "int | None":
    """Paced-realtime serving (VERDICT r4 #2): N clients stream at 1×
    — sleep-paced 2 s writes, like live stations feeding at capture
    cadence — with REAL detections in every chunk (one normal + one
    marker hit), unlike the offline-drain capacity ladder. Measures the
    product claim directly: per-event latency from the moment an
    event's chunk finished uploading to the moment the client read the
    JSONL line, and whether every station held cadence. Records
    serve_live{N}_p99_event_latency_s / _events / _slip_s in _EXTRA and
    returns serve_capacity_live_streams: the largest N where every
    client completed, no client slipped more than one chunk past the
    ideal wall, and p99 event latency stayed under one chunk period.

    Wall cost: each rung runs one stream-length at 1× (two chunks =
    2×chunk_seconds) — this is inherent to a paced measurement.
    """
    import math
    import socket
    import threading

    import numpy as np

    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
    from audio_pattern_detector_tpu.serve import PatternServer

    steps = [
        int(s)
        for s in os.environ.get("APD_BENCH_LIVE_STEPS", "64,128").split(",")
        if s
    ]
    import struct

    n_chunks = 2
    stream_s = n_chunks * chunk_seconds
    audio = np.concatenate([hit_chunks[i % len(hit_chunks)] for i in range(n_chunks)])
    body = audio.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body))
    )
    chunk_bytes = chunk_seconds * sr * 2
    block_s = 2.0
    block_bytes = int(block_s * sr) * 2

    capacity: "int | None" = None
    for width in steps:
        det = AudioPatternDetector(
            audio_clips=clips, seconds_per_chunk=chunk_seconds
        )
        det._bank = bank
        server = PatternServer(
            detector=det, max_streams=width, timestamp_format="ms",
            pipeline_depth=2,
        )
        server.warmup()
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.address[1]

        latencies: list = []
        walls: list = [None] * width
        lat_lock = threading.Lock()

        def client(i: int) -> None:
            # Random-ish phase offset so stations are desynchronised
            # like real capture cadences (also spreads round sizes).
            time.sleep((i % 16) * (block_s / 16.0))
            sock = socket.create_connection(("127.0.0.1", port), timeout=300)
            chunk_done: dict[int, float] = {}
            my_lat: list = []
            end_seen = threading.Event()

            def receiver() -> None:
                buf = b""
                sock.settimeout(stream_s + 300)
                while True:
                    try:
                        d = sock.recv(1 << 16)
                    except OSError:
                        break
                    if not d:
                        break
                    buf += d
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        ev = json.loads(line)
                        if ev["type"] == "pattern_detected":
                            t = time.perf_counter()
                            k, r = divmod(
                                ev["timestamp_ms"], chunk_seconds * 1000
                            )
                            # Boundary-ambiguous events are excluded: a
                            # hit whose clip extends past its chunk's end
                            # is detected while processing the NEXT chunk
                            # (lookback), so chunk-k attribution would
                            # inflate its latency by a whole chunk. 2 s
                            # covers every shipped clip length.
                            if chunk_seconds * 1000 - r <= 2000:
                                continue
                            done = chunk_done.get(k)
                            if done is not None:
                                my_lat.append(t - done)
                        elif ev["type"] == "end":
                            assert ev["total_time_ms"] == stream_s * 1000
                            end_seen.set()

            rx = threading.Thread(target=receiver, daemon=True)
            rx.start()
            t0 = time.perf_counter()
            sock.sendall(hdr)
            sent = 0
            while sent < len(body):
                block = body[sent : sent + block_bytes]
                sock.sendall(block)
                sent += len(block)
                if sent % chunk_bytes == 0 or sent == len(body):
                    chunk_done[(sent - 1) // chunk_bytes] = time.perf_counter()
                # Pace: sleep until the wall time this byte offset
                # corresponds to at 1× realtime.
                target = t0 + (sent / 2) / sr
                delay = target - time.perf_counter()
                if delay > 0 and sent < len(body):
                    time.sleep(delay)
            sock.shutdown(socket.SHUT_WR)
            end_seen.wait(timeout=300)
            rx.join(timeout=60)
            sock.close()
            if end_seen.is_set():
                walls[i] = time.perf_counter() - t0
                with lat_lock:
                    latencies.extend(my_lat)

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(width)
        ]
        t_rung = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=stream_s + 600)
        ok = all(w is not None for w in walls) and not any(
            t.is_alive() for t in threads
        )
        server.shutdown()
        thread.join(timeout=30)

        if not ok or not latencies:
            print(
                f"[bench] serve_live{width}: incomplete "
                f"({sum(w is None for w in walls)} clients unfinished)",
                file=sys.stderr,
            )
            break
        lat_sorted = sorted(latencies)
        p99 = lat_sorted[
            min(len(lat_sorted) - 1, math.ceil(0.99 * len(lat_sorted)) - 1)
        ]
        p50 = lat_sorted[len(lat_sorted) // 2]
        # Cadence slip: how far the worst station's end-to-end wall ran
        # past the stream length (a 1×-paced station that keeps up
        # finishes within one round-latency of the audio duration).
        slip = max(w for w in walls) - stream_s
        _EXTRA[f"serve_live{width}_events"] = len(latencies)
        _EXTRA[f"serve_live{width}_p50_event_latency_s"] = round(p50, 3)
        _EXTRA[f"serve_live{width}_p99_event_latency_s"] = round(p99, 3)
        _EXTRA[f"serve_live{width}_slip_s"] = round(slip, 2)
        print(
            f"[bench] serve_live{width}: {len(latencies)} events, "
            f"p50 {p50:.3f}s p99 {p99:.3f}s slip {slip:.2f}s "
            f"({time.perf_counter() - t_rung:.0f}s rung)",
            file=sys.stderr,
        )
        if p99 <= chunk_seconds and slip <= chunk_seconds:
            capacity = width
            _EXTRA["serve_live_p99_event_latency_s"] = round(p99, 3)
        else:
            break
    return capacity


def _measure_cold_start() -> "tuple[float, float]":
    """(first_run_s, warm_run_s) wall for a fresh-process one-pattern
    `match` over 120 s of WAV audio — the CLI deployment cold-start
    figure (reference anchor: docs/native-helper.md's ~1 s cold-start
    rationale). Each run is a separate interpreter; the persistent XLA
    cache makes the second run the steady-state number."""
    import tempfile
    import wave as wave_mod

    import numpy as np

    script = (
        "import sys, time\n"
        "t0 = time.perf_counter()\n"
        "from audio_pattern_detector_tpu.utils.compile_cache import "
        "enable_persistent_cache\n"
        "enable_persistent_cache()\n"
        "from audio_pattern_detector_tpu.match import match_pattern\n"
        "match_pattern(sys.argv[1], [sys.argv[2]], accumulate_results=False)\n"
        "print('WALL', time.perf_counter() - t0)\n"
    )
    with tempfile.TemporaryDirectory(prefix="apd_cold_") as td:
        rng = np.random.default_rng(0)
        sr = 8000
        paths = {}
        for name, seconds, amp in (("a.wav", 120, 0.05), ("p.wav", 1, 0.3)):
            arr = (amp * rng.standard_normal(seconds * sr)).astype(np.float32)
            path = os.path.join(td, name)
            _wav_write(path, arr, sr)
            paths[name] = path

        walls = []
        for _ in range(2):
            r = subprocess.run(
                [sys.executable, "-c", script, paths["a.wav"], paths["p.wav"]],
                capture_output=True,
                text=True,
                timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = next(
                (
                    ln
                    for ln in r.stdout.splitlines()
                    if ln.startswith("WALL")
                ),
                None,
            )
            if r.returncode != 0 or line is None:
                raise RuntimeError(
                    f"cold-start child failed rc={r.returncode}: "
                    f"{r.stderr[-300:]}"
                )
            walls.append(float(line.split()[1]))
    return walls[0], walls[1]


def run_bench() -> dict:
    import numpy as np

    from __graft_entry__ import _make_bank

    sr = 8000
    chunk_seconds = 60
    bank, clips = _make_bank(num_normal=32, num_marker=32, chunk_seconds=chunk_seconds)

    rng = np.random.default_rng(7)
    n_distinct = 4
    # 16-bit-PCM-grid audio, like real WAV/stdin sources — engages the
    # packed int16-pair upload path (ops/packing.py) exactly as
    # production streams do.
    chunks = [
        (
            np.clip(
                np.round(0.05 * rng.standard_normal(chunk_seconds * sr) * 32768),
                -32768,
                32767,
            )
            / np.float32(32768.0)
        ).astype(np.float32)
        for _ in range(n_distinct)
    ]
    # Raw int16 views of the same samples: what the WAV/stdin wrappers
    # now actually hand the engine (int16 passthrough — no host decode,
    # no re-quantise; bit-identical results). Streaming/batch metrics
    # feed these; exact since the f32 chunks sit on the PCM16 grid.
    chunks_i16 = [
        (c * np.float32(32768.0)).astype(np.int16) for c in chunks
    ]

    # Warmup: compile + first execution.
    prev = None
    for i in range(2):
        bank.process_chunk(chunks_i16[i % n_distinct], prev)
        prev = chunks_i16[i % n_distinct]

    def run_streaming(n_iters: int, depth: int = 1) -> tuple[float, int]:
        """The production streaming pattern (_pipelined_loop): up to
        ``depth`` chunks in flight with eager in-order collection."""
        nonlocal prev
        elapsed, detections, prev = _pipelined_loop(
            bank, lambda i: chunks_i16[i % n_distinct], n_iters, prev, depth
        )
        return n_iters * chunk_seconds / elapsed, detections

    # Quick 5-iter probe persisted immediately: if the tunnel degrades
    # mid-run, this round still has a real on-chip number.
    quick_x, detections = run_streaming(5)
    _persist_partial(quick_x, detections)

    # ── Streaming steady state (includes h2d + host-side unpack) ──
    def _streaming_sample() -> float:
        nonlocal detections
        x, detections = run_streaming(15)
        return x

    _fam_begin("streaming")
    _sample("streaming", _streaming_sample)
    _persist_partial(_stats("streaming")[0], detections)

    # ── Deep pipeline (3 chunks in flight): hides per-launch round trips ──
    _sample("deep_pipeline", lambda: run_streaming(15, depth=3)[0])
    _fam_end("streaming")

    # ── Device-only: the jitted class step, h2d/unpack excluded ──
    import jax
    import jax.numpy as jnp

    from audio_pattern_detector_tpu.models.bank import _class_step_jit

    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    S = cls["section_len"]
    section = jnp.asarray(
        (0.05 * rng.standard_normal(S)).astype(np.float32)
    )
    group_consts = tuple((g.corr, g.verify) for g in cls["groups"])

    def dev_step():
        return _class_step_jit(
            section,
            jnp.float32(S),
            cls["loud"],
            group_consts,
            metas=bank._metas[sw],
            height_min=bank.height_min,
            lean=True,
        )

    jax.block_until_ready(dev_step())  # warm
    n_dev = 15

    def _device_sample() -> float:
        t0 = time.perf_counter()
        outs = None
        for _i in range(n_dev):
            outs = dev_step()
        jax.block_until_ready(outs)
        return n_dev * chunk_seconds / (time.perf_counter() - t0)

    _fam_begin("device_only")
    _sample("device_only", _device_sample)
    _fam_end("device_only")

    # ── Batched offline scan (amortised launches) ──
    from audio_pattern_detector_tpu.models.detector import AudioPatternDetector

    det = AudioPatternDetector(audio_clips=clips, seconds_per_chunk=chunk_seconds)
    det._bank = bank
    batch = int(os.environ.get("APD_BENCH_BATCH", "4"))
    # 8 batches per run: the offline loop keeps up to 3 batches in flight
    # with eager draining, so a longer run measures the pipelined steady
    # state instead of the exposed head/tail of a 2-batch scan.
    # batch_mode defaults to "scan" since round 4 (same-window A/B:
    # ~21.7 ms/chunk vs ~27 for vmap — scripts/dev/batch_inflation_ab.py).
    long_audio = np.concatenate(
        [chunks_i16[i % n_distinct] for i in range(batch * 8)]
    )
    det.find_clip_in_array(long_audio, batch_size=batch)  # warm the batch program

    def _batched_sample() -> float:
        t0 = time.perf_counter()
        det.find_clip_in_array(long_audio, batch_size=batch)
        return (len(long_audio) / sr) / (time.perf_counter() - t0)

    _fam_begin("offline_batch")
    _sample("batched", _batched_sample)

    # ── Scanned offline (one launch per batch, chunks sequential on-device;
    # per-launch overhead amortised — the remote-runtime offline mode) ──
    scan_batch = int(os.environ.get("APD_BENCH_SCAN_BATCH", "16"))
    scan_audio = np.concatenate(
        [chunks_i16[i % n_distinct] for i in range(scan_batch * 3)]
    )
    det.find_clip_in_array(scan_audio, batch_size=scan_batch, batch_mode="scan")

    def _scanned_sample() -> float:
        t0 = time.perf_counter()
        det.find_clip_in_array(
            scan_audio, batch_size=scan_batch, batch_mode="scan"
        )
        return (len(scan_audio) / sr) / (time.perf_counter() - t0)

    _sample("scanned", _scanned_sample)
    _fam_end("offline_batch")

    # ── Big-chunk configurations (first-class engine configs via
    # --chunk-seconds: larger chunks amortise per-launch round trips and
    # per-chunk fixed costs at the price of result latency) ──
    big_banks: dict[int, tuple] = {}

    def measure_big_chunk(big_s: int) -> float:
        if big_s not in big_banks:
            bank_b, _ = _make_bank(
                num_normal=32, num_marker=32, chunk_seconds=big_s
            )
            mult = big_s // chunk_seconds
            cbig = [
                np.concatenate(
                    [chunks_i16[(i + j) % n_distinct] for j in range(mult)]
                )
                for i in range(n_distinct)
            ]
            prev_b = None
            for i in range(2):
                bank_b.process_chunk(cbig[i % n_distinct], prev_b)
                prev_b = cbig[i % n_distinct]
            big_banks[big_s] = (bank_b, cbig, prev_b)
        bank_b, cbig, prev_b = big_banks[big_s]
        elapsed, _dets, prev_b = _pipelined_loop(
            bank_b, lambda i: cbig[i % n_distinct], 10, prev_b, 3
        )
        big_banks[big_s] = (bank_b, cbig, prev_b)
        return 10 * big_s / elapsed

    big_sizes = [
        int(s)
        for s in os.environ.get("APD_BENCH_BIG_CHUNKS", "120,240,480").split(",")
        if s
    ]
    _fam_begin("chunk_combos")
    for _pass in range(3):
        for big_s in big_sizes:
            try:
                _rec(f"chunk{big_s}", measure_big_chunk(big_s))
            except Exception as e:  # noqa: BLE001 — secondary metric only
                print(f"[bench] chunk{big_s} metric failed: {e}", file=sys.stderr)
    # Adaptive re-sampling where a degraded period polluted a spread
    # (same policy as _sample, applied to the interleaved-pass layout).
    for big_s in big_sizes:
        _resample_if_spread(
            f"chunk{big_s}",
            functools.partial(measure_big_chunk, big_s),
            secondary=True,
        )

    # ── Batched live streaming (--stream-batch N: N chunks per launch in
    # the streaming loop; the launch amortiser for live streams) ──
    import io

    from audio_pattern_detector_tpu.utils.clip import AudioStream

    def run_stream_batch(n_iters: int, sb: int, mode: str) -> float:
        # int16 bytes + sample_dtype=int16: the stdin passthrough wire
        # format (what _WavStdinStreamWrapper now yields for 16-bit WAV).
        raw = b"".join(
            chunks_i16[i % n_distinct].tobytes() for i in range(n_iters)
        )
        stream = AudioStream(
            name="bench",
            audio_stream=io.BytesIO(raw),
            sample_rate=sr,
            sample_dtype=np.int16,
        )
        t0 = time.perf_counter()
        det.find_clip_in_audio(
            stream,
            accumulate_results=False,
            stream_batch=sb,
            stream_batch_mode=mode,
            pipeline_depth=3,
        )
        return n_iters * chunk_seconds / (time.perf_counter() - t0)

    stream_batch_n = int(os.environ.get("APD_BENCH_STREAM_BATCH", "8"))
    modes = os.environ.get("APD_BENCH_STREAM_BATCH_MODES", "scan,vmap").split(",")
    mode_samples: dict[str, list[float]] = {}
    for mode in [m for m in modes if m]:
        try:
            run_stream_batch(stream_batch_n, stream_batch_n, mode)  # warm
            mode_samples[mode] = [
                run_stream_batch(5 * stream_batch_n, stream_batch_n, mode)
                for _ in range(3)
            ]
        except Exception as e:  # noqa: BLE001 — secondary metric only
            print(f"[bench] stream-batch {mode} failed: {e}", file=sys.stderr)
    if mode_samples:
        # Mode is a config choice, not noise: report the better mode's
        # samples (by median) as THE stream-batch metric.
        best_mode = max(mode_samples, key=lambda m: statistics.median(mode_samples[m]))
        for s in mode_samples[best_mode]:
            _rec("stream_batch", s)
        _resample_if_spread(
            "stream_batch",
            lambda: run_stream_batch(
                5 * stream_batch_n, stream_batch_n, best_mode
            ),
            secondary=True,
        )

    # Combo: big chunks x stream-batch (e.g. 4x240 s per launch) — the
    # launch amortisers compose. "cs:sb[:mode]" via APD_BENCH_COMBOS.
    for spec in os.environ.get("APD_BENCH_COMBOS", "240:4").split(","):
        if not spec:
            continue
        try:
            parts = spec.split(":")
            cs, sb = int(parts[0]), int(parts[1])
            mode = parts[2] if len(parts) > 2 else "scan"
            det_c = AudioPatternDetector(
                audio_clips=clips, seconds_per_chunk=cs
            )
            n_iters = 2 * sb
            raw = b"".join(
                chunks_i16[i % n_distinct].tobytes()
                for i in range(n_iters * (cs // chunk_seconds))
            )
            stream = AudioStream(
                name="combo",
                audio_stream=io.BytesIO(raw),
                sample_rate=sr,
                sample_dtype=np.int16,
            )
            det_c.find_clip_in_audio(
                stream,
                accumulate_results=False,
                stream_batch=sb,
                stream_batch_mode=mode,
                pipeline_depth=3,
            )  # warm
            suffix = "" if mode == "scan" else f"_{mode}"
            for _ in range(3):
                raw_stream = AudioStream(
                    name="combo",
                    audio_stream=io.BytesIO(raw),
                    sample_rate=sr,
                    sample_dtype=np.int16,
                )
                t0 = time.perf_counter()
                det_c.find_clip_in_audio(
                    raw_stream,
                    accumulate_results=False,
                    stream_batch=sb,
                    stream_batch_mode=mode,
                )
                _rec(
                    f"chunk{cs}_sb{sb}{suffix}",
                    n_iters * cs / (time.perf_counter() - t0),
                )
        except Exception as e:  # noqa: BLE001 — secondary metric only
            print(f"[bench] combo {spec} failed: {e}", file=sys.stderr)
    _fam_end("chunk_combos")

    _fam_begin("hit_bearing")
    # ── Hit-bearing stream (VERDICT r1 #1): every chunk carries one
    # normal hit and one marker-tone hit, so the lean tier's flag-2 path
    # (row-granular / class full-tier rerun) prices into the measurement —
    # the zero-hit headline alone never exercises it. ──
    def make_hit_chunk(base: "np.ndarray") -> "np.ndarray":
        c = base.copy()
        normal_clip = clips[0].audio  # 1 s noise clip
        marker_clip = clips[32].audio  # 0.25 s tone (900 Hz)
        c[10 * sr : 10 * sr + len(normal_clip)] += 0.8 * normal_clip
        c[30 * sr : 30 * sr + len(marker_clip)] += 0.7 * marker_clip
        # Raw int16, like the passthrough streaming metric it pairs with.
        return np.clip(np.round(c * 32768), -32768, 32767).astype(np.int16)

    hit_chunks = [make_hit_chunk(c) for c in chunks]
    hit_detections = 0
    try:
        prev_h = None
        for i in range(2):  # warm (incl. rerun/fallback programs)
            bank.process_chunk(hit_chunks[i % n_distinct], prev_h)
            prev_h = hit_chunks[i % n_distinct]

        def _hit_sample() -> float:
            nonlocal prev_h, hit_detections
            elapsed, dets, prev_h = _pipelined_loop(
                bank, lambda i: hit_chunks[i % n_distinct], 15, prev_h, 3
            )
            hit_detections = dets
            return 15 * chunk_seconds / elapsed

        _sample("hit_bearing", _hit_sample)
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] hit-bearing metric failed: {e}", file=sys.stderr)
    _fam_end("hit_bearing")

    # ── Default CLI path (VERDICT r1 #2): plain
    # `match file.wav --pattern-file ...` with no tuning flags — file-mode
    # auto-perf chunk sizing must clear the target on its own. ──
    _fam_begin("default_cli")
    try:
        _measure_default_cli(clips, chunks, sr, chunk_seconds)
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] default-CLI metric failed: {e}", file=sys.stderr)
    _fam_end("default_cli")

    # ── Multi-stream serving (MultiStreamSession): N independent live
    # streams, one vmapped launch per feed round — a single chip serving
    # N stations concurrently. Aggregate audio-seconds per wall-second
    # (excluded from the single-stream headline max). ──
    n_ms = int(os.environ.get("APD_BENCH_MULTI_STREAMS", "8"))
    _fam_begin("multi_stream")
    try:
        from audio_pattern_detector_tpu.models.multistream import (
            MultiStreamSession,
        )

        sess = MultiStreamSession(det, n_streams=n_ms)
        # int16 rows: the serve ingest wire format (passthrough).
        sess.feed([chunks_i16[i % n_distinct] for i in range(n_ms)])  # warm B=n
        ms_rounds = 8

        def _ms_sample() -> float:
            # 3 rounds in flight with eager draining, like every other
            # pipelined loop here (synchronous feed serializes launch +
            # d2h + unpack against device compute).
            pend: list = []
            t0 = time.perf_counter()
            for r in range(ms_rounds):
                pend.append(
                    sess.dispatch(
                        [chunks_i16[(r + i) % n_distinct] for i in range(n_ms)]
                    )
                )
                while len(pend) > 1 and sess.round_ready(pend[0]):
                    sess.collect(pend.pop(0))
                if len(pend) > 3:
                    sess.collect(pend.pop(0))
            while pend:
                sess.collect(pend.pop(0))
            return (
                n_ms * ms_rounds * chunk_seconds
                / (time.perf_counter() - t0)
            )

        _sample(f"multi_stream{n_ms}", _ms_sample)
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] multi-stream metric failed: {e}", file=sys.stderr)
    _fam_end("multi_stream")

    # ── TCP serve stack (VERDICT r2 #7): real loopback clients through
    # serve.py's selector loop — the deployment surface, measured. ──
    _fam_begin("serve")
    try:
        _measure_serve(clips, bank, chunks, sr, chunk_seconds)
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] serve metric failed: {e}", file=sys.stderr)
    _fam_end("serve")

    # ── Serving-capacity ladder (VERDICT r3 #3): N = 32/64/128 clients;
    # capacity = largest N sustaining >= 1x realtime per stream. ──
    serve_capacity: "int | None" = None
    _fam_begin("serve_capacity")
    try:
        serve_capacity = _measure_serve_capacity(
            clips, bank, chunks, sr, chunk_seconds
        )
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] serve capacity ladder failed: {e}", file=sys.stderr)
    _fam_end("serve_capacity")

    # ── Paced-realtime serving (VERDICT r4 #2): clients stream at 1×
    # with real detections per chunk; per-event latency p99 + cadence
    # hold are the live-stations product claim, measured directly. ──
    serve_live_capacity: "int | None" = None
    # Each paced rung inherently costs one stream-length of wall (1×
    # pacing); skip on the CPU smoke path unless explicitly requested.
    _live_wanted = (
        "APD_BENCH_LIVE_STEPS" in os.environ
        or jax.devices()[0].platform != "cpu"
    )
    if _live_wanted:
        _fam_begin("serve_live")
        try:
            serve_live_capacity = _measure_serve_live(
                clips, bank, hit_chunks, sr, chunk_seconds
            )
        except Exception as e:  # noqa: BLE001 — secondary metric only
            print(
                f"[bench] paced live serving rung failed: {e}",
                file=sys.stderr,
            )
        _fam_end("serve_live")

    # ── CLI cold start (VERDICT r3 #2): wall time of a fresh-process
    # one-pattern `match` on 120 s of audio, persistent compile cache
    # warm (the deployment-relevant figure; the first run also warms any
    # cold cache entries and is reported separately). ──
    cold_first = cold_warm = None
    _fam_begin("cold_start")
    try:
        cold_first, cold_warm = _measure_cold_start()
    except Exception as e:  # noqa: BLE001 — secondary metric only
        print(f"[bench] cold-start metric failed: {e}", file=sys.stderr)
    _fam_end("cold_start")

    # Final streaming sample (after the big compiles; widens the window
    # coverage of the headline path's spread).
    _fam_begin("streaming_final")
    x, _ = run_streaming(15)
    _rec("streaming", x)
    _fam_end("streaming_final")
    _persist_partial(_stats("streaming")[0], detections)

    platform = jax.devices()[0].platform

    # Aggregate-across-streams metrics are not single-stream numbers.
    headline_excluded_prefixes = ("multi_stream", "serve", "device_only")
    medians = {name: _stats(name)[0] for name in _SAMPLES}
    best = max(
        (
            v
            for name, v in medians.items()
            if not name.startswith(headline_excluded_prefixes)
        ),
        default=0.0,
    )

    result = {
        "metric": "realtime_factor_64clip",
        "value": round(best, 1),
        "unit": "x_realtime",
        "vs_baseline": round(best / 1000.0, 3),
        "stats": "median over >=3 samples per metric; spread=[min,max]",
        "hit_bearing_detections": hit_detections,
        "platform": platform,
        "detections": detections,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if serve_capacity is not None:
        result["serve_capacity_streams"] = serve_capacity
    if serve_live_capacity is not None:
        result["serve_capacity_live_streams"] = serve_live_capacity
    if _HEALTH:
        result["window_health"] = dict(_HEALTH)
        result["all_windows_healthy"] = all(
            h["healthy"] for h in _HEALTH.values()
        )
    result.update(_EXTRA)
    if cold_warm is not None:
        result["cold_start_seconds"] = round(cold_warm, 2)
        result["cold_start_first_seconds"] = round(cold_first, 2)
    for name in sorted(_SAMPLES):
        med, lo, hi, n = _stats(name)
        result[f"{name}_x_realtime"] = round(med, 1)
        result[f"{name}_x_realtime_spread"] = [round(lo, 1), round(hi, 1)]
        result[f"{name}_n"] = n

    summary = ", ".join(
        f"{name} {result[f'{name}_x_realtime']:.0f}x"
        f"[{result[f'{name}_x_realtime_spread'][0]:.0f}"
        f"-{result[f'{name}_x_realtime_spread'][1]:.0f}]"
        for name in sorted(_SAMPLES)
    )
    print(
        f"[bench] medians (spread): {summary} on {platform} "
        f"({detections} detections)",
        file=sys.stderr,
    )
    return result


def _inner() -> None:
    import jax

    # Persistent compilation cache cuts retry cost across processes.
    cache_dir = os.path.join(os.path.dirname(RESULT_PATH), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    # A degraded window can make the canary HANG (first d2h never
    # completes) rather than fail — observed 2026-08-20: 30+ min of
    # silence. SIGALRM turns a hung canary into the same fast
    # degraded-window exit the parent already understands.
    import signal

    def _canary_timeout(_sig, _frm):
        print("[bench] canary timed out (hung d2h)", file=sys.stderr)
        sys.stderr.flush()
        os._exit(CANARY_FAILED_RC)

    signal.signal(signal.SIGALRM, _canary_timeout)
    signal.alarm(int(os.environ.get("APD_BENCH_CANARY_TIMEOUT_S", "240")))
    try:
        _canary()
    except Exception as e:  # degraded window: signal the parent to wait
        print(f"[bench] canary failed: {type(e).__name__}: {e}", file=sys.stderr)
        sys.exit(CANARY_FAILED_RC)
    finally:
        signal.alarm(0)

    result = run_bench()
    if result.get("platform") != "cpu":
        result = _merge_history(result)
        os.makedirs(os.path.dirname(RESULT_PATH), exist_ok=True)
        with open(RESULT_PATH, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


def _merge_history(result: dict) -> dict:
    """Append this run's medians to the persisted per-run history.

    Reported metrics are THIS run's medians with their in-run spread —
    prior runs' numbers are never folded into the reported values (the
    shared chip swings ±30% between healthy windows; a best-of-history
    headline would overstate what one window measures). History stays
    inspectable under "runs" (most recent last, capped)."""
    prev = None
    try:
        with open(RESULT_PATH) as f:
            prev = json.load(f)
    except Exception:
        pass
    this_run = {
        k: v
        for k, v in result.items()
        if k.endswith("_x_realtime") or k.endswith("_x_realtime_spread")
    }
    this_run["measured_at"] = result["measured_at"]
    runs = (prev or {}).get("runs", [])
    runs = (runs + [this_run])[-12:]
    result["runs"] = runs
    result["n_runs_recorded"] = len(runs)
    return result


def _report(result: dict) -> None:
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    for k in sorted(result):
        if (
            k.endswith("_x_realtime")
            or k.endswith("_x_realtime_spread")
            or k.endswith("_p99_wall_s")
            or k
            in (
                "stats",
                "hit_bearing_detections",
                "platform",
                "measured_at",
                "cached",
                "serve_capacity_streams",
                "cold_start_seconds",
                "cold_start_first_seconds",
            )
        ):
            line[k] = result[k]
    print(json.dumps(line), flush=True)


def main() -> None:
    if os.environ.get("APD_BENCH_INNER") == "1":
        _inner()
        return

    env = dict(os.environ, APD_BENCH_INNER="1")
    budget = float(os.environ.get("APD_BENCH_BUDGET_S", "5400"))
    deadline = time.monotonic() + budget
    attempt = 0
    sleep_healthy, sleep_degraded = 30.0, 240.0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        # Cap each attempt well below the whole budget: a window that
        # degrades MID-RUN (after the canary) would otherwise hang one
        # child for the entire budget with nothing persisted.
        attempt_cap = float(os.environ.get("APD_BENCH_ATTEMPT_CAP_S", "3600"))
        timed_out = False
        r = None
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=max(120.0, min(attempt_cap, remaining)),
            )
        except subprocess.TimeoutExpired as te:
            timed_out = True
            print(f"[bench] attempt {attempt} timed out", file=sys.stderr)
            if te.stderr:
                err = te.stderr
                if isinstance(err, bytes):
                    err = err.decode(errors="replace")
                sys.stderr.write(err[-2000:])
        if r is not None:
            sys.stderr.write(r.stderr)
            line = next(
                (ln for ln in r.stdout.splitlines() if ln.startswith("{")), None
            )
            if r.returncode == 0 and line:
                _report(json.loads(line))
                return
        # rc==CANARY_FAILED_RC: window degraded before any real work.
        # Any other nonzero rc (or a mid-run hang): the canary passed but
        # the flagship program still died/hung — the window is degraded
        # for large programs, so back off on the same escalating schedule
        # rather than churning.
        degraded = timed_out or r.returncode != 0
        sleep = sleep_degraded if degraded else sleep_healthy
        sleep_degraded = min(sleep_degraded * 1.5, 900.0)
        kind = (
            "mid-run hang (attempt cap)"
            if timed_out
            else "degraded window (canary)"
            if r.returncode == CANARY_FAILED_RC
            else f"rc={r.returncode}"
        )
        print(
            f"[bench] attempt {attempt} failed [{kind}]; "
            f"retrying in {sleep:.0f}s ({remaining - sleep:.0f}s budget left)",
            file=sys.stderr,
        )
        if time.monotonic() + sleep >= deadline:
            break
        time.sleep(sleep)

    # All live attempts failed: fall back to a measurement recorded in an
    # earlier healthy window (a real on-chip number from this round).
    if os.path.exists(RESULT_PATH):
        with open(RESULT_PATH) as f:
            result = json.load(f)
        if result.get("value", 0) > 0:
            result["cached"] = True
            print(
                f"[bench] live attempts exhausted; reporting the measurement "
                f"recorded at {result.get('measured_at')}",
                file=sys.stderr,
            )
            _report(result)
            return
    print(
        json.dumps(
            {
                "metric": "realtime_factor_64clip",
                "value": 0.0,
                "unit": "x_realtime",
                "vs_baseline": 0.0,
                "error": "backend failure after retries",
            }
        ),
        flush=True,
    )
    sys.exit(1)


if __name__ == "__main__":
    main()
