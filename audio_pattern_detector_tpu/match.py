"""Match orchestration: pattern resolution, stream wrappers, JSONL output.

Behavioural parity with the reference orchestration layer
(reference: audio_pattern_detector/match.py): resolves pattern files
(including folder globs of ``*.wav`` + ``*.apd.toml``), builds an
``AudioStream`` from a WAV file / ffmpeg decode / stdin, drives the
detector, and emits streaming JSONL events (``start`` / ``pattern_detected``
/ ``end``) with per-clip equal-millisecond dedup. stdout carries only
machine-readable JSONL; all human diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import wave
from pathlib import Path
from typing import Any

import numpy as np
from numpy.typing import NDArray

from audio_pattern_detector_tpu.models.detector import (
    AudioPatternDetector,
    PatternDetectedCallback,
)
from audio_pattern_detector_tpu.utils.audio_io import (
    DEFAULT_TARGET_SAMPLE_RATE,
    ffmpeg_get_float32_pcm,
    resample_audio,
)
from audio_pattern_detector_tpu.utils.clip import AudioClip, AudioStream
from audio_pattern_detector_tpu.utils.timefmt import seconds_to_time


def _emit_jsonl(event_type: str, **kwargs: Any) -> None:
    """Emit a JSONL event to stdout, flushing immediately."""
    event = {"type": event_type, **kwargs}
    print(json.dumps(event, ensure_ascii=False), flush=True)


def _read_uint32(stream: Any) -> int:
    data = stream.read(4)
    if len(data) < 4:
        raise ValueError(f"Unexpected EOF reading uint32 (got {len(data)} bytes)")
    return int.from_bytes(data, byteorder="little", signed=False)


def _read_patterns_from_multiplexed_stdin(target_sample_rate: int) -> list[AudioClip]:
    """Read pattern clips from the multiplexed stdin protocol.

    Wire format (uint32 little-endian lengths):
        [n_patterns] then per pattern [name_len][name utf8][data_len][wav bytes],
    followed by the WAV audio stream until EOF. Limits: <=100 patterns,
    names <=1024 B, patterns <=100 MB (reference: match.py:38-95).
    """
    stdin = sys.stdin.buffer
    num_patterns = _read_uint32(stdin)
    if num_patterns == 0:
        raise ValueError("No patterns provided in multiplexed stdin")
    if num_patterns > 100:
        raise ValueError(f"Too many patterns ({num_patterns}), max is 100")

    print(f"Reading {num_patterns} pattern(s) from multiplexed stdin...", file=sys.stderr)

    pattern_clips: list[AudioClip] = []
    for i in range(num_patterns):
        name_length = _read_uint32(stdin)
        if name_length == 0 or name_length > 1024:
            raise ValueError(f"Invalid pattern name length: {name_length}")
        name_bytes = stdin.read(name_length)
        if len(name_bytes) < name_length:
            raise ValueError(f"Unexpected EOF reading pattern name {i + 1}")
        name = name_bytes.decode("utf-8")

        data_length = _read_uint32(stdin)
        if data_length == 0:
            raise ValueError(f"Pattern '{name}' has zero-length data")
        if data_length > 100 * 1024 * 1024:
            raise ValueError(f"Pattern '{name}' data too large: {data_length} bytes")
        wav_data = stdin.read(data_length)
        if len(wav_data) < data_length:
            raise ValueError(f"Unexpected EOF reading pattern '{name}' data")

        clip = AudioClip.from_wav_bytes(wav_data, name, sample_rate=target_sample_rate)
        pattern_clips.append(clip)
        print(
            f"  Loaded pattern '{name}' ({clip.clip_length_seconds():.2f}s)",
            file=sys.stderr,
        )
    return pattern_clips


def _validate_wav_header(stream: Any, target_sample_rate: int) -> tuple[int, int]:
    """Walk RIFF chunks and validate a streamable WAV header.

    Accepts mono 16/32-bit PCM or 32-bit IEEE float at exactly the target
    rate (stdin audio must be pre-resampled; reference: match.py:215-283).
    Returns (audio_format, bits_per_sample).
    """
    import struct

    riff = stream.read(4)
    if riff != b"RIFF":
        raise ValueError(f"Not a WAV file: expected RIFF, got {riff!r}")
    stream.read(4)  # file size (ignored)
    wave_sig = stream.read(4)
    if wave_sig != b"WAVE":
        raise ValueError(f"Not a WAV file: expected WAVE, got {wave_sig!r}")

    while True:
        chunk_id = stream.read(4)
        if len(chunk_id) < 4:
            raise ValueError("WAV file missing fmt chunk")
        chunk_size = struct.unpack("<I", stream.read(4))[0]
        if chunk_id == b"fmt ":
            break
        skipped = stream.read(chunk_size)
        if len(skipped) != chunk_size:
            raise ValueError("WAV file truncated while skipping chunk")

    fmt_data = stream.read(chunk_size)
    if len(fmt_data) < 16:
        raise ValueError("WAV fmt chunk too short")
    audio_format, channels, sample_rate, _, _, bits_per_sample = struct.unpack(
        "<HHIIHH", fmt_data[:16]
    )

    if audio_format == 1:  # integer PCM
        if bits_per_sample not in (16, 32):
            raise ValueError(f"Expected 16-bit or 32-bit PCM, got {bits_per_sample}")
    elif audio_format == 3:  # IEEE float
        if bits_per_sample != 32:
            raise ValueError(f"Expected 32-bit float, got {bits_per_sample}")
    else:
        raise ValueError(f"Expected PCM (1) or IEEE float (3) format, got {audio_format}")
    if channels != 1:
        raise ValueError(f"Expected mono (1 channel), got {channels}")
    if sample_rate != target_sample_rate:
        raise ValueError(f"Expected {target_sample_rate} Hz, got {sample_rate}")

    while True:
        chunk_id = stream.read(4)
        if len(chunk_id) < 4:
            raise ValueError("WAV file missing data chunk")
        chunk_size_bytes = stream.read(4)
        if len(chunk_size_bytes) < 4:
            raise ValueError("WAV file truncated")
        if chunk_id == b"data":
            break
        chunk_size = struct.unpack("<I", chunk_size_bytes)[0]
        skipped = stream.read(chunk_size)
        if len(skipped) != chunk_size:
            raise ValueError("WAV file truncated while skipping chunk")

    return audio_format, bits_per_sample


class _WavStdinStreamWrapper:
    """Stream float32 PCM from a WAV on stdin (header-validated)."""

    def __init__(self, target_sample_rate: int) -> None:
        self._audio_format, self._bits_per_sample = _validate_wav_header(
            sys.stdin.buffer, target_sample_rate
        )
        if self._audio_format == 3:
            self._dtype = np.dtype(np.float32)
        elif self._bits_per_sample == 16:
            self._dtype = np.dtype(np.int16)
        else:
            self._dtype = np.dtype(np.int32)
        fmt_name = "float32" if self._audio_format == 3 else f"int{self._bits_per_sample}"
        print(f"WAV stdin: {target_sample_rate}Hz, mono, {fmt_name}", file=sys.stderr)

    def read(self, size: int, /) -> bytes:
        target_samples = size // 4  # output float32
        read_bytes = target_samples * self._dtype.itemsize
        data = sys.stdin.buffer.read(read_bytes)
        if not data:
            return b""
        raw = np.frombuffer(data, dtype=self._dtype)
        if self._dtype == np.int16:
            return (raw.astype(np.float32) / np.float32(32768.0)).tobytes()
        if self._dtype == np.int32:
            return (raw.astype(np.float32) / np.float32(2147483648.0)).tobytes()
        return raw.tobytes()


class _WavFileStreamWrapper:
    """Stream float32 PCM from a WAV file, resampling incrementally."""

    def __init__(self, file_path: str, target_sample_rate: int) -> None:
        self.target_sample_rate = target_sample_rate
        self._bytes_per_sample = 4
        self._validated = False
        self._file_path = file_path
        try:
            self._wav: wave.Wave_read = wave.open(file_path, "rb")
        except (wave.Error, FileNotFoundError, OSError) as e:
            raise ValueError(f"Failed to read WAV file {file_path}: {e}")
        self.input_sample_rate = self._wav.getframerate()
        self._channels = self._wav.getnchannels()
        self._sampwidth = self._wav.getsampwidth()
        self.needs_resample = self.input_sample_rate != target_sample_rate
        if self._channels != 1:
            print(
                f"Warning: WAV has {self._channels} channels, will be mixed to mono",
                file=sys.stderr,
            )

    def _validate_first_chunk(self, audio: NDArray[np.float32]) -> None:
        """Warn (stderr) about NaN/Inf/over-range/all-zero first chunks."""
        if self._validated or len(audio) == 0:
            return
        self._validated = True
        warnings: list[str] = []
        if np.any(np.isnan(audio)):
            warnings.append("Audio contains NaN values - data may be corrupt")
        if np.any(np.isinf(audio)):
            warnings.append("Audio contains Inf values - data may be corrupt")
        max_abs = np.max(np.abs(audio))
        if max_abs > 1.5:
            warnings.append(f"Audio values exceed expected range (max: {max_abs:.2f})")
        if np.all(audio == 0):
            warnings.append("First chunk is all zeros - verify input is correct")
        for warning in warnings:
            print(f"Warning: {warning}", file=sys.stderr)

    def read(self, size: int, /) -> bytes:
        target_samples = size // self._bytes_per_sample
        if self.needs_resample:
            input_samples = int(
                target_samples * self.input_sample_rate / self.target_sample_rate
            )
        else:
            input_samples = target_samples

        raw_data = self._wav.readframes(input_samples)
        if not raw_data:
            return b""

        if self._sampwidth == 2:
            audio = np.frombuffer(raw_data, dtype=np.int16).astype(np.float32) / 32768.0
        elif self._sampwidth == 4:
            audio = (
                np.frombuffer(raw_data, dtype=np.int32).astype(np.float32) / 2147483648.0
            )
        elif self._sampwidth == 1:
            audio = (
                np.frombuffer(raw_data, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        else:
            raise ValueError(f"Unsupported WAV sample width: {self._sampwidth} bytes")

        if self._channels > 1:
            audio = audio.reshape(-1, self._channels).mean(axis=1).astype(np.float32)

        if not self._validated:
            self._validate_first_chunk(audio)

        if self.needs_resample:
            audio = resample_audio(audio, self.input_sample_rate, self.target_sample_rate)
        return audio.tobytes()

    def close(self) -> None:
        self._wav.close()




def _run_detector(
    detector: AudioPatternDetector,
    stream: AudioStream,
    on_pattern_detected: PatternDetectedCallback | None,
    accumulate_results: bool,
    profile: bool,
    trace_dir: "str | None",
    pipeline_depth: int = 1,
    stream_batch: int = 1,
    stream_batch_mode: str = "scan",
) -> tuple[dict[str, list[float]] | None, float]:
    from audio_pattern_detector_tpu.utils.profiling import device_trace

    with device_trace(trace_dir):
        result = detector.find_clip_in_audio(
            stream,
            on_pattern_detected=on_pattern_detected,
            accumulate_results=accumulate_results,
            pipeline_depth=pipeline_depth,
            stream_batch=stream_batch,
            stream_batch_mode=stream_batch_mode,
        )
    if profile:
        stats = getattr(detector, "last_run_stats", None)
        if stats is not None:
            print(f"profile: {json.dumps(stats.as_dict())}", file=sys.stderr)
    return result


def _run_detector_offline(
    detector: AudioPatternDetector,
    stream: AudioStream,
    on_pattern_detected: PatternDetectedCallback | None,
    accumulate_results: bool,
    batch_chunks: int,
    trace_dir: "str | None",
    batch_mode: str = "vmap",
) -> tuple[dict[str, list[float]] | None, float]:
    """Offline batched scan: identical results to the streaming loop via
    ``find_clip_in_array`` (same chunking/lookback/timestamp algebra), but
    ``batch_chunks`` chunks per device launch — computed in parallel
    (``batch_mode="vmap"``) or sequentially inside one launch
    (``batch_mode="scan"``, one-chunk memory footprint and per-launch
    overhead amortised over the batch). Events fire after the scan, sorted
    by timestamp — the throughput mode for whole files, not live streams."""
    from audio_pattern_detector_tpu.utils.profiling import device_trace

    bufs = []
    while True:
        b = stream.audio_stream.read(1 << 22)
        if not b:
            break
        bufs.append(b)
    audio = np.frombuffer(b"".join(bufs), dtype=np.float32)
    with device_trace(trace_dir):
        peak_times, total_time = detector.find_clip_in_array(
            audio, batch_size=batch_chunks, batch_mode=batch_mode
        )
    if on_pattern_detected is not None:
        for t, name in sorted(
            (t, name) for name, ts in peak_times.items() for t in ts
        ):
            on_pattern_detected(name, t)
    return (peak_times if accumulate_results else None), total_time


AUTO_PERF_MAX_CHUNK_SECONDS = 240


def _auto_perf_chunk_seconds(
    audio_source: str, pattern_clips: list[AudioClip], sr: int
) -> int:
    """File-mode default chunk size: as few launches as the file allows.

    Detections are chunk-size-invariant (pinned by the offline-scan and
    big-chunk equivalence tests), but every chunk pays a fixed per-launch
    cost on remote device runtimes — so for whole files the default sizes
    chunks up to AUTO_PERF_MAX_CHUNK_SECONDS from the file duration
    instead of shipping the live-stream 60 s default. Small files keep
    60 s chunks (single launch anyway; also keeps behaviour identical to
    the reference corpus flows). Falls back to 60 when the duration is
    unprobeable."""
    from audio_pattern_detector_tpu.utils.audio_io import get_audio_duration

    duration: float | None = None
    if audio_source.lower().endswith(".wav"):
        try:
            with wave.open(audio_source, "rb") as w:
                rate = w.getframerate()
                duration = w.getnframes() / rate if rate else None
        except (wave.Error, OSError):
            duration = None
    else:
        duration = get_audio_duration(audio_source)

    if duration is None or duration <= 60:
        chunk = 60
    else:
        chunk = min(AUTO_PERF_MAX_CHUNK_SECONDS, int(np.ceil(duration)))
    # The engine requires seconds_per_chunk >= 2x the largest sliding
    # window (reference: audio_pattern_detector.py:122-136).
    max_sw = max(
        (max(1, int(np.ceil(c.clip_length_seconds()))) for c in pattern_clips),
        default=1,
    )
    return max(chunk, 2 * max_sw)


def match_pattern(
    audio_source: str | None,
    pattern_files: list[str],
    debug_mode: bool = False,
    on_pattern_detected: PatternDetectedCallback | None = None,
    accumulate_results: bool = True,
    seconds_per_chunk: int | None = 60,
    chunk_seconds_auto_perf: bool = False,
    from_stdin: bool = False,
    target_sample_rate: int | None = None,
    debug_dir: str = "./tmp",
    height_min: float | None = None,
    profile: bool = False,
    trace_dir: str | None = None,
    offline_batch: int | None = None,
    offline_batch_mode: str = "vmap",
    pipeline_depth: int = 1,
    stream_batch: int = 1,
    stream_batch_mode: str = "scan",
) -> tuple[dict[str, list[float]] | None, float]:
    """Find pattern matches in an audio file or stdin stream.

    Library entry point with the reference's contract
    (reference: match.py:98-212). ``profile`` prints per-stage wall-clock
    stats to stderr after the run; ``trace_dir`` wraps the run in a
    jax.profiler device trace. ``offline_batch`` (file mode only) scans the
    whole file through the batched device path — N chunks per launch,
    streaming-identical results, events emitted post-scan.
    ``pipeline_depth`` keeps that many chunks in flight on the device
    (identical results; emission deferred by that many chunks).
    ``stream_batch`` runs that many consecutive chunks per device launch
    in the streaming loop (identical results; emission deferred to batch
    boundaries) — the live-stream launch amortiser.
    """
    if offline_batch is not None and (from_stdin or offline_batch < 1):
        raise ValueError("offline_batch requires file mode and a positive batch size")
    if offline_batch_mode not in ("vmap", "scan"):
        raise ValueError(
            f"offline_batch_mode must be 'vmap' or 'scan', got {offline_batch_mode!r}"
        )
    if not from_stdin:
        if audio_source is None or not os.path.exists(audio_source):
            raise ValueError(f"Audio {audio_source} does not exist")

    sr = target_sample_rate if target_sample_rate is not None else DEFAULT_TARGET_SAMPLE_RATE

    pattern_clips = []
    clip_names_seen: dict[str, str] = {}
    for pattern_file in pattern_files:
        if not os.path.exists(pattern_file):
            raise ValueError(f"Pattern {pattern_file} does not exist")
        pattern_clip = AudioClip.from_audio_file(pattern_file, sample_rate=sr)
        if pattern_clip.name in clip_names_seen:
            raise ValueError(
                f"Duplicate clip name '{pattern_clip.name}' from files:\n"
                f"  - {clip_names_seen[pattern_clip.name]}\n"
                f"  - {pattern_file}\n"
                f"Use --pattern-file with name=path syntax to specify unique names."
            )
        clip_names_seen[pattern_clip.name] = pattern_file
        pattern_clips.append(pattern_clip)

    if len(pattern_clips) == 0:
        raise ValueError("No pattern clips passed")

    if from_stdin:
        return _match_pattern_wav_stdin(
            pattern_clips=pattern_clips,
            pipeline_depth=pipeline_depth,
            stream_batch=stream_batch,
            stream_batch_mode=stream_batch_mode,
            debug_mode=debug_mode,
            on_pattern_detected=on_pattern_detected,
            accumulate_results=accumulate_results,
            seconds_per_chunk=seconds_per_chunk,
            target_sample_rate=sr,
            debug_dir=debug_dir,
            height_min=height_min,
            profile=profile,
            trace_dir=trace_dir,
        )

    assert audio_source is not None
    if chunk_seconds_auto_perf and not debug_mode and offline_batch is None:
        seconds_per_chunk = _auto_perf_chunk_seconds(
            audio_source, pattern_clips, sr
        )
    audio_name = Path(audio_source).stem
    print(f"Finding pattern in audio file {audio_name}...", file=sys.stderr)

    if audio_source.lower().endswith(".wav"):
        stream_wrapper = _WavFileStreamWrapper(audio_source, sr)
        try:
            full_streaming_audio = AudioStream(
                name=audio_name, audio_stream=stream_wrapper, sample_rate=sr
            )
            detector = AudioPatternDetector(
                debug_mode=debug_mode,
                audio_clips=pattern_clips,
                seconds_per_chunk=seconds_per_chunk,
                target_sample_rate=sr,
                debug_dir=debug_dir,
                height_min=height_min,
            )
            if offline_batch is not None:
                peak_times, total_time = _run_detector_offline(
                    detector, full_streaming_audio, on_pattern_detected,
                    accumulate_results, offline_batch, trace_dir,
                    offline_batch_mode,
                )
            else:
                peak_times, total_time = _run_detector(
                    detector, full_streaming_audio, on_pattern_detected,
                    accumulate_results, profile, trace_dir, pipeline_depth,
                    stream_batch, stream_batch_mode,
                )
        finally:
            stream_wrapper.close()
        return peak_times, total_time

    with ffmpeg_get_float32_pcm(audio_source, target_sample_rate=sr, ac=1) as stdout:
        full_streaming_audio = AudioStream(
            name=audio_name, audio_stream=stdout, sample_rate=sr
        )
        detector = AudioPatternDetector(
            debug_mode=debug_mode,
            audio_clips=pattern_clips,
            seconds_per_chunk=seconds_per_chunk,
            target_sample_rate=sr,
            debug_dir=debug_dir,
        )
        if offline_batch is not None:
            peak_times, total_time = _run_detector_offline(
                detector, full_streaming_audio, on_pattern_detected,
                accumulate_results, offline_batch, trace_dir,
                offline_batch_mode,
            )
        else:
            peak_times, total_time = _run_detector(
                detector, full_streaming_audio, on_pattern_detected,
                accumulate_results, profile, trace_dir, pipeline_depth,
                stream_batch, stream_batch_mode,
            )
    return peak_times, total_time


def _match_pattern_wav_stdin(
    pattern_clips: list[AudioClip],
    debug_mode: bool,
    on_pattern_detected: PatternDetectedCallback | None,
    accumulate_results: bool,
    seconds_per_chunk: int | None,
    target_sample_rate: int,
    debug_dir: str = "./tmp",
    height_min: float | None = None,
    profile: bool = False,
    trace_dir: "str | None" = None,
    pipeline_depth: int = 1,
    stream_batch: int = 1,
    stream_batch_mode: str = "scan",
) -> tuple[dict[str, list[float]] | None, float]:
    stream_wrapper = _WavStdinStreamWrapper(target_sample_rate)
    audio_name = "stdin"
    print(f"Finding pattern in audio stream {audio_name}...", file=sys.stderr)
    full_streaming_audio = AudioStream(
        name=audio_name, audio_stream=stream_wrapper, sample_rate=target_sample_rate
    )
    detector = AudioPatternDetector(
        debug_mode=debug_mode,
        audio_clips=pattern_clips,
        seconds_per_chunk=seconds_per_chunk,
        target_sample_rate=target_sample_rate,
        debug_dir=debug_dir,
        height_min=height_min,
    )
    return _run_detector(
        detector, full_streaming_audio, on_pattern_detected,
        accumulate_results, profile, trace_dir, pipeline_depth,
        stream_batch, stream_batch_mode,
    )


def _match_pattern_multiplexed_stdin(
    debug_mode: bool,
    on_pattern_detected: PatternDetectedCallback | None,
    accumulate_results: bool,
    seconds_per_chunk: int | None,
    target_sample_rate: int,
    debug_dir: str = "./tmp",
    height_min: float | None = None,
    pipeline_depth: int = 1,
    stream_batch: int = 1,
    stream_batch_mode: str = "scan",
) -> tuple[dict[str, list[float]] | None, float]:
    """Multiplexed stdin: patterns via the binary protocol, then WAV audio."""
    pattern_clips = _read_patterns_from_multiplexed_stdin(target_sample_rate)
    print("Reading WAV audio from stdin...", file=sys.stderr)
    stream_wrapper = _WavStdinStreamWrapper(target_sample_rate)
    full_streaming_audio = AudioStream(
        name="stdin", audio_stream=stream_wrapper, sample_rate=target_sample_rate
    )
    detector = AudioPatternDetector(
        debug_mode=debug_mode,
        audio_clips=pattern_clips,
        seconds_per_chunk=seconds_per_chunk,
        target_sample_rate=target_sample_rate,
        debug_dir=debug_dir,
        height_min=height_min,
    )
    return detector.find_clip_in_audio(
        full_streaming_audio,
        on_pattern_detected=on_pattern_detected,
        accumulate_results=accumulate_results,
        pipeline_depth=pipeline_depth,
        stream_batch=stream_batch,
        stream_batch_mode=stream_batch_mode,
    )


def _make_jsonl_callback(timestamp_format: str = "both") -> PatternDetectedCallback:
    """pattern_detected JSONL emitter with per-clip equal-ms dedup
    (overlap-region duplicates are expected; reference: match.py:524-551)."""
    last_ms: dict[str, int] = {}

    def callback(clip_name: str, timestamp: float) -> None:
        ts_ms = round(timestamp * 1000)
        if last_ms.get(clip_name) == ts_ms:
            return
        last_ms[clip_name] = ts_ms
        if timestamp_format == "formatted":
            _emit_jsonl(
                "pattern_detected",
                clip_name=clip_name,
                timestamp_formatted=seconds_to_time(timestamp),
            )
        elif timestamp_format == "ms":
            _emit_jsonl("pattern_detected", clip_name=clip_name, timestamp_ms=ts_ms)
        else:
            _emit_jsonl(
                "pattern_detected",
                clip_name=clip_name,
                timestamp_ms=ts_ms,
                timestamp_formatted=seconds_to_time(timestamp),
            )

    return callback


def _emit_jsonl_end(total_time: float, timestamp_format: str = "both") -> None:
    if timestamp_format == "formatted":
        _emit_jsonl("end", total_time_formatted=seconds_to_time(total_time))
    elif timestamp_format == "ms":
        _emit_jsonl("end", total_time_ms=round(total_time * 1000))
    else:
        _emit_jsonl(
            "end",
            total_time_ms=round(total_time * 1000),
            total_time_formatted=seconds_to_time(total_time),
        )


def _run_match_with_output(
    args: argparse.Namespace,
    pattern_files: list[str],
    audio_source: str | None,
    from_stdin: bool = False,
    seconds_per_chunk: int | None = 60,
    chunk_seconds_auto_perf: bool = False,
    target_sample_rate: int | None = None,
    debug_dir: str = "./tmp",
    height_min: float | None = None,
    profile: bool = False,
    trace_dir: "str | None" = None,
    offline_batch: int | None = None,
    offline_batch_mode: str = "vmap",
    pipeline_depth: int = 1,
    stream_batch: int = 1,
    stream_batch_mode: str = "scan",
) -> tuple[None, float]:
    timestamp_format: str = getattr(args, "timestamp_format", "both")
    callback = _make_jsonl_callback(timestamp_format)
    _emit_jsonl("start", source="stdin" if from_stdin else (audio_source or "unknown"))

    _, total_time = match_pattern(
        audio_source,
        pattern_files,
        debug_mode=args.debug,
        on_pattern_detected=callback,
        accumulate_results=False,
        seconds_per_chunk=seconds_per_chunk,
        chunk_seconds_auto_perf=chunk_seconds_auto_perf,
        from_stdin=from_stdin,
        target_sample_rate=target_sample_rate,
        debug_dir=debug_dir,
        height_min=height_min,
        profile=profile,
        trace_dir=trace_dir,
        offline_batch=offline_batch,
        offline_batch_mode=offline_batch_mode,
        pipeline_depth=pipeline_depth,
        stream_batch=stream_batch,
        stream_batch_mode=stream_batch_mode,
    )
    print(f"Total time processed: {seconds_to_time(seconds=total_time)}", file=sys.stderr)
    _emit_jsonl_end(total_time, timestamp_format)
    return None, total_time


def cmd_match(args: argparse.Namespace) -> None:
    """Handler for the ``match`` subcommand."""
    chunk_seconds_str = getattr(args, "chunk_seconds", None)
    chunk_auto_perf = False
    if chunk_seconds_str is None:
        # No explicit chunk size: 60 s for live streams; file mode
        # auto-sizes from the file duration (see _auto_perf_chunk_seconds).
        seconds_per_chunk: int | None = 60
        chunk_auto_perf = True
    elif chunk_seconds_str.lower() == "auto":
        seconds_per_chunk = None
    else:
        try:
            seconds_per_chunk = int(chunk_seconds_str)
        except ValueError:
            print(
                f"Error: --chunk-seconds must be 'auto' or a positive integer, "
                f"got '{chunk_seconds_str}'",
                file=sys.stderr,
            )
            sys.exit(1)

    target_sample_rate = getattr(args, "target_sample_rate", None)
    sr = target_sample_rate if target_sample_rate is not None else DEFAULT_TARGET_SAMPLE_RATE
    debug_dir: str = getattr(args, "debug_dir", "./tmp")
    height_min: float | None = getattr(args, "height_min", None)
    profile: bool = getattr(args, "profile", False)
    trace_dir: "str | None" = getattr(args, "trace_dir", None)
    multiplexed_stdin = getattr(args, "multiplexed_stdin", False)
    timestamp_format: str = getattr(args, "timestamp_format", "both")

    if multiplexed_stdin:
        callback = _make_jsonl_callback(timestamp_format)
        _emit_jsonl("start", source="multiplexed-stdin")
        _, total_time = _match_pattern_multiplexed_stdin(
            debug_mode=args.debug,
            on_pattern_detected=callback,
            accumulate_results=False,
            seconds_per_chunk=seconds_per_chunk,
            target_sample_rate=sr,
            debug_dir=debug_dir,
            height_min=height_min,
            pipeline_depth=getattr(args, "pipeline_depth", 1) or 1,
            stream_batch=getattr(args, "stream_batch", 1) or 1,
            stream_batch_mode=getattr(args, "stream_batch_mode", "scan")
            or "scan",
        )
        print(
            f"Total time processed: {seconds_to_time(seconds=total_time)}",
            file=sys.stderr,
        )
        _emit_jsonl_end(total_time, timestamp_format)
        return

    pattern_files: list[str] = []
    if args.pattern_folder:
        for folder in args.pattern_folder:
            for ext in ("wav", "apd.toml"):
                for pattern_file in glob.glob(f"{folder}/*.{ext}"):
                    print(f"adding pattern file {pattern_file}...", file=sys.stderr)
                    pattern_files.append(pattern_file)
    if args.pattern_file:
        pattern_files.extend(args.pattern_file)

    if not pattern_files:
        print(
            "Please provide either --pattern-file, --pattern-folder, or --multiplexed-stdin",
            file=sys.stderr,
        )
        sys.exit(1)

    pipeline_depth: int = getattr(args, "pipeline_depth", 1) or 1
    stream_batch: int = getattr(args, "stream_batch", 1) or 1
    stream_batch_mode: str = getattr(args, "stream_batch_mode", "scan") or "scan"
    if args.stdin:
        _run_match_with_output(
            args,
            pattern_files,
            None,
            from_stdin=True,
            seconds_per_chunk=seconds_per_chunk,
            target_sample_rate=target_sample_rate,
            debug_dir=debug_dir,
            height_min=height_min,
            profile=profile,
            trace_dir=trace_dir,
            pipeline_depth=pipeline_depth,
            stream_batch=stream_batch,
            stream_batch_mode=stream_batch_mode,
        )
    elif args.audio_file:
        offline_batch: "int | None" = getattr(args, "offline_batch", None)
        _run_match_with_output(
            args,
            pattern_files,
            args.audio_file,
            seconds_per_chunk=seconds_per_chunk,
            chunk_seconds_auto_perf=chunk_auto_perf,
            target_sample_rate=target_sample_rate,
            debug_dir=debug_dir,
            height_min=height_min,
            profile=profile,
            trace_dir=trace_dir,
            offline_batch=offline_batch,
            offline_batch_mode=getattr(args, "offline_batch_mode", "vmap"),
            pipeline_depth=pipeline_depth,
            stream_batch=stream_batch,
            stream_batch_mode=stream_batch_mode,
        )
    else:
        print("Please provide an audio file or --stdin or --multiplexed-stdin", file=sys.stderr)
        sys.exit(1)


def cmd_show_config(args: argparse.Namespace) -> None:
    """Handler for the ``show-config`` subcommand."""
    target_sample_rate = getattr(args, "target_sample_rate", None)
    pattern_file = args.pattern_file
    if not os.path.exists(pattern_file):
        print(f"Error: Pattern {pattern_file} does not exist", file=sys.stderr)
        sys.exit(1)
    pattern_clips = [AudioClip.from_audio_file(pattern_file, sample_rate=target_sample_rate)]
    detector = AudioPatternDetector(
        audio_clips=pattern_clips,
        debug_mode=False,
        seconds_per_chunk=None,  # auto mode shows the computed minimum
        target_sample_rate=target_sample_rate,
    )
    print(json.dumps(detector.get_config(), indent=2, ensure_ascii=False))
