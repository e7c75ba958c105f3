"""CLI integration: real subprocess runs of the console entry point.

Mirrors the reference CLI suite (reference: tests/test_cli_integration.py):
JSONL schema per timestamp format, stdin WAV piping, wrong-rate rejection,
multiplexed protocol, show-config, and error exits.
"""

import io
import json
import os
import struct
import subprocess
import sys
import wave

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, SAMPLE_AUDIOS

RTHK_AUDIO = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")
RTHK_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")


def run_cli(args, stdin_bytes=None, timeout=300):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO_ROOT
    # Force CPU: without this, an env-stripped subprocess can auto-detect a
    # local TPU plugin and interfere with the shared accelerator tunnel.
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "audio_pattern_detector_tpu", *args],
        input=stdin_bytes,
        capture_output=True,
        timeout=timeout,
        env=env,
        cwd=REPO_ROOT,
    )


def parse_jsonl(stdout: bytes):
    return [json.loads(line) for line in stdout.decode().splitlines() if line.strip()]


def wav_bytes_int16(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(np.clip(audio * 32767, -32768, 32767).astype(np.int16).tobytes())
    return buf.getvalue()


class TestMatchFileMode:
    def test_jsonl_schema_both(self):
        r = run_cli(["match", RTHK_AUDIO, "--pattern-file", RTHK_PATTERN])
        assert r.returncode == 0, r.stderr.decode()
        events = parse_jsonl(r.stdout)
        assert events[0]["type"] == "start"
        assert events[0]["source"] == RTHK_AUDIO
        assert events[-1]["type"] == "end"
        assert "total_time_ms" in events[-1]
        assert isinstance(events[-1]["total_time_formatted"], str)
        detections = [e for e in events if e["type"] == "pattern_detected"]
        assert len(detections) == 2
        for e in detections:
            assert e["clip_name"] == "rthk_beep"
            assert isinstance(e["timestamp_ms"], int)
            assert isinstance(e["timestamp_formatted"], str)
        assert abs(detections[0]["timestamp_ms"] - 1407) <= 10
        assert abs(detections[1]["timestamp_ms"] - 2419) <= 10

    def test_timestamp_format_ms_only(self):
        r = run_cli(
            ["match", RTHK_AUDIO, "--pattern-file", RTHK_PATTERN, "--timestamp-format", "ms"]
        )
        assert r.returncode == 0
        events = parse_jsonl(r.stdout)
        for e in events:
            assert "timestamp_formatted" not in e
            assert "total_time_formatted" not in e

    def test_timestamp_format_formatted_only(self):
        r = run_cli(
            [
                "match",
                RTHK_AUDIO,
                "--pattern-file",
                RTHK_PATTERN,
                "--timestamp-format",
                "formatted",
            ]
        )
        assert r.returncode == 0
        events = parse_jsonl(r.stdout)
        for e in events:
            assert "timestamp_ms" not in e
            assert "total_time_ms" not in e

    def test_pattern_folder_glob(self):
        clips_dir = os.path.join(SAMPLE_AUDIOS, "test_generated", "clips")
        audio = os.path.join(SAMPLE_AUDIOS, "test_generated", "interleaved_patterns.wav")
        r = run_cli(["match", audio, "--pattern-folder", clips_dir])
        assert r.returncode == 0, r.stderr.decode()
        assert b"adding pattern file" in r.stderr

    def test_missing_pattern_flag_errors(self):
        r = run_cli(["match", RTHK_AUDIO])
        assert r.returncode == 1
        assert b"--pattern-file" in r.stderr


class TestMatchStdin:
    def test_stdin_wav_int16(self):
        # Pipe the real sample WAV (8 kHz mono int16) through stdin; same
        # detections as file mode.
        with open(RTHK_AUDIO, "rb") as f:
            wav = f.read()
        r = run_cli(
            ["match", "--stdin", "--pattern-file", RTHK_PATTERN], stdin_bytes=wav
        )
        assert r.returncode == 0, r.stderr.decode()
        events = parse_jsonl(r.stdout)
        assert events[0]["source"] == "stdin"
        detections = [e for e in events if e["type"] == "pattern_detected"]
        assert len(detections) == 2
        assert abs(detections[0]["timestamp_ms"] - 1407) <= 10
        assert abs(detections[1]["timestamp_ms"] - 2419) <= 10

    def test_stdin_wrong_rate_rejected(self):
        audio = np.zeros(1000, dtype=np.float32)
        r = run_cli(
            ["match", "--stdin", "--pattern-file", RTHK_PATTERN],
            stdin_bytes=wav_bytes_int16(audio, 44100),
        )
        assert r.returncode != 0
        assert b"Expected 8000 Hz" in r.stderr


class TestMultiplexedStdin:
    def build_payload(self, patterns: dict[str, bytes], audio_wav: bytes) -> bytes:
        out = struct.pack("<I", len(patterns))
        for name, data in patterns.items():
            nb = name.encode()
            out += struct.pack("<I", len(nb)) + nb
            out += struct.pack("<I", len(data)) + data
        return out + audio_wav

    def test_multiplexed_detection(self):
        sr = 8000
        rng = np.random.default_rng(5)
        clip = (0.4 * rng.standard_normal(sr)).astype(np.float32)
        audio = 0.01 * rng.standard_normal(6 * sr)
        audio[2 * sr : 3 * sr] += clip
        payload = self.build_payload(
            {"noiseclip": wav_bytes_int16(clip, sr)},
            wav_bytes_int16(audio.astype(np.float32), sr),
        )
        r = run_cli(["match", "--multiplexed-stdin"], stdin_bytes=payload)
        assert r.returncode == 0, r.stderr.decode()
        events = parse_jsonl(r.stdout)
        assert events[0]["source"] == "multiplexed-stdin"
        detections = [e for e in events if e["type"] == "pattern_detected"]
        assert len(detections) == 1
        assert detections[0]["clip_name"] == "noiseclip"
        assert abs(detections[0]["timestamp_ms"] - 2000) <= 20

    def test_zero_patterns_rejected(self):
        r = run_cli(["match", "--multiplexed-stdin"], stdin_bytes=struct.pack("<I", 0))
        assert r.returncode != 0
        assert b"No patterns" in r.stderr


class TestShowConfig:
    def test_schema(self):
        r = run_cli(["show-config", RTHK_PATTERN])
        assert r.returncode == 0, r.stderr.decode()
        cfg = json.loads(r.stdout)
        assert cfg["default_seconds_per_chunk"] == 60
        assert cfg["sample_rate"] == 8000
        assert cfg["min_chunk_size_seconds"] == 2
        assert cfg["clips"]["rthk_beep"]["duration_seconds"] == pytest.approx(0.228375)
        assert cfg["clips"]["rthk_beep"]["sliding_window_seconds"] == 1

    def test_missing_pattern(self):
        r = run_cli(["show-config", "/nonexistent.wav"])
        assert r.returncode == 1

    def test_no_command_prints_help(self):
        r = run_cli([])
        assert r.returncode == 1
