"""CLI surface of the device-mesh sharded scan (--mesh-time/--mesh-bank).

The distributed layer (parallel/sequence.py) must be reachable from the
product CLI with byte-identical JSONL output to the serial engine — the
serial contract is the reference's
(reference: audio_pattern_detector/audio_pattern_detector.py:400-452);
the mesh flags are this framework's scale-out surface on top of it.
Runs on the virtual 8-device CPU mesh.
"""

import os

import numpy as np

import pytest

from tests.conftest import SAMPLE_AUDIOS
from tests.test_cli_integration import parse_jsonl, run_cli, wav_bytes_int16

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

RTHK_AUDIO = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")
RTHK_PATTERN = os.path.join(SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml")
SR = 8000


def run_cli_mesh(args, stdin_bytes=None, timeout=600):
    """run_cli with a virtual 8-device mesh in the subprocess."""
    prev = os.environ.get("XLA_FLAGS")
    os.environ["XLA_FLAGS"] = (
        (prev or "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    try:
        return run_cli(args, stdin_bytes=stdin_bytes, timeout=timeout)
    finally:
        if prev is None:
            del os.environ["XLA_FLAGS"]
        else:
            os.environ["XLA_FLAGS"] = prev


class TestShardedCli:
    def test_mesh_time_byte_identical_to_serial(self):
        serial = run_cli(
            ["match", "--pattern-file", RTHK_PATTERN, RTHK_AUDIO]
        )
        sharded = run_cli_mesh(
            ["match", "--mesh-time", "4", "--pattern-file", RTHK_PATTERN, RTHK_AUDIO]
        )
        assert serial.returncode == 0, serial.stderr.decode()
        assert sharded.returncode == 0, sharded.stderr.decode()
        assert sharded.stdout == serial.stdout
        events = parse_jsonl(sharded.stdout)
        assert [e["type"] for e in events] == [
            "start", "pattern_detected", "pattern_detected", "end",
        ]

    def test_mesh_bank_times_time_byte_identical(self):
        serial = run_cli(
            ["match", "--pattern-file", RTHK_PATTERN, RTHK_AUDIO]
        )
        sharded = run_cli_mesh(
            [
                "match", "--mesh-time", "2", "--mesh-bank", "2",
                "--pattern-file", RTHK_PATTERN, RTHK_AUDIO,
            ]
        )
        assert sharded.returncode == 0, sharded.stderr.decode()
        assert sharded.stdout == serial.stdout

    def test_stdin_mesh_matches_serial(self):
        """Long (multi-slab) stdin stream: tile the real RTHK section to
        ~163 s so detections land in several mesh slabs."""
        import wave

        with wave.open(RTHK_AUDIO, "rb") as w:
            assert w.getframerate() == SR
            pcm = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.int16
            )
        section = (pcm / 32768.0).astype(np.float32)
        audio = np.concatenate([section] * 40)
        wav = wav_bytes_int16(audio, SR)

        base = ["match", "--stdin", "--pattern-file", RTHK_PATTERN]
        serial = run_cli(base, stdin_bytes=wav)
        sharded = run_cli_mesh(base + ["--mesh-time", "4"], stdin_bytes=wav)
        assert serial.returncode == 0, serial.stderr.decode()
        assert sharded.returncode == 0, sharded.stderr.decode()
        assert sharded.stdout == serial.stdout
        n_hits = sum(
            e["type"] == "pattern_detected" for e in parse_jsonl(serial.stdout)
        )
        assert n_hits >= 40  # ~2 beeps per tiled section (ms-dedup may merge)

    def test_mesh_incompatible_with_batch_flags(self):
        r = run_cli_mesh(
            [
                "match", "--mesh-time", "4", "--offline-batch", "2",
                "--pattern-file", RTHK_PATTERN, RTHK_AUDIO,
            ]
        )
        assert r.returncode != 0
        assert b"incompatible" in r.stderr

    def test_mesh_bank_requires_mesh_time(self):
        r = run_cli_mesh(
            [
                "match", "--mesh-bank", "2",
                "--pattern-file", RTHK_PATTERN, RTHK_AUDIO,
            ]
        )
        assert r.returncode != 0
        assert b"mesh_bank requires mesh_time" in r.stderr

    def test_mesh_needs_enough_devices(self):
        r = run_cli_mesh(
            [
                "match", "--mesh-time", "64",
                "--pattern-file", RTHK_PATTERN, RTHK_AUDIO,
            ]
        )
        assert r.returncode != 0
        assert b"devices" in r.stderr
