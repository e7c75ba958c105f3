"""Byte-for-byte CLI diff against the REFERENCE implementation.

Runs the reference CLI (its pure Python unmodified, native deps shimmed by
this repo's exact host anchors — see scripts/run_reference_cli.py) and this
repo's CLI on the same corpus inputs, and asserts the stdout JSONL streams
are byte-identical: same events, same field order, same formatting, for all
three --timestamp-format modes and show-config.

This replaces golden-constant assertions with a live differential gate over
the reference's own emitters (reference: match.py:524-565, tests pinned at
reference tests/test_cli_integration.py:19-49). Caveat recorded in
docs/reference-parity.md: `andrew_utils.seconds_to_time` is unobtainable
offline, so both sides format timestamps with this repo's reimplementation;
the formatted fields therefore verify the shared formatter's placement, not
the third-party package itself.
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT, SAMPLE_AUDIOS

REFERENCE_DIR = os.environ.get("APD_REFERENCE_DIR", "/root/reference")

needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "audio_pattern_detector")),
    reason="reference checkout not available",
)


def _run(cmd, stdin_bytes=None):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        cmd,
        input=stdin_bytes,
        capture_output=True,
        timeout=600,
        env=env,
        cwd=REPO_ROOT,
    )


def run_reference(args, stdin_bytes=None):
    return _run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "run_reference_cli.py"),
            REFERENCE_DIR,
            "--",
            *args,
        ],
        stdin_bytes,
    )


def run_ours(args, stdin_bytes=None):
    return _run(
        [sys.executable, "-m", "audio_pattern_detector_tpu", *args],
        stdin_bytes,
    )


def assert_stdout_identical(args, stdin_bytes=None):
    ref = run_reference(args, stdin_bytes)
    ours = run_ours(args, stdin_bytes)
    assert ref.returncode == ours.returncode, (
        f"exit codes differ: reference={ref.returncode} ours={ours.returncode}\n"
        f"reference stderr tail: {ref.stderr[-500:]!r}\n"
        f"our stderr tail: {ours.stderr[-500:]!r}"
    )
    assert ref.stdout == ours.stdout, (
        "stdout differs\n"
        f"--- reference ---\n{ref.stdout.decode(errors='replace')}\n"
        f"--- ours ---\n{ours.stdout.decode(errors='replace')}"
    )


def p(*parts):
    return os.path.join(SAMPLE_AUDIOS, *parts)


MATCH_CASES = [
    # (pattern file, audio file) — marker tone, normal, short clip,
    # Opus-degraded, and false-positive pairs across the corpus.
    pytest.param(
        p("clips", "rthk_beep.apd.toml"),
        p("rthk_section_with_beep.wav"),
        id="rthk-marker",
    ),
    pytest.param(
        p("clips", "cbs_news.wav"),
        p("cbs_news_audio_section.wav"),
        id="cbs-normal",
    ),
    pytest.param(
        p("clips", "天空下的彩虹intro.wav"),
        p("am1430_section_with_rainbow_intro.wav"),
        id="am1430-rainbow",
    ),
    pytest.param(
        p("clips", "881_beep.apd.toml"),
        p("rthk_section_with_beep.wav"),
        id="881-vs-rthk-fp",
    ),
    pytest.param(
        p("clips", "903_beep.apd.toml"),
        p(
            "regressions",
            "903_beep_openings",
            "radio903_2026-04-17_09_to_10_12s_opening.wav",
        ),
        id="903-opening",
    ),
    pytest.param(
        p("clips", "rthk_beep.apd.toml"),
        p(
            "regressions",
            "rthk_beep_stray_clips_v2",
            "tp_09-10_beep1.wav",
        ),
        id="rthk-stray-tp",
    ),
]


@needs_reference
class TestMatchDiff:
    @pytest.mark.parametrize("pattern,audio", MATCH_CASES)
    def test_default_format(self, pattern, audio):
        assert_stdout_identical(["match", "--pattern-file", pattern, audio])

    @pytest.mark.parametrize(
        "fmt", ["both", "ms", "formatted"], ids=lambda f: f"fmt-{f}"
    )
    def test_timestamp_formats(self, fmt):
        assert_stdout_identical(
            [
                "match",
                "--pattern-file",
                p("clips", "rthk_beep.apd.toml"),
                p("rthk_section_with_beep.wav"),
                "--timestamp-format",
                fmt,
            ]
        )

    def test_pattern_folder(self):
        assert_stdout_identical(
            [
                "match",
                "--pattern-folder",
                p("clips"),
                p("rthk_section_with_beep.wav"),
            ]
        )

    def test_stdin_wav(self):
        with open(p("rthk_section_with_beep.wav"), "rb") as f:
            wav = f.read()
        assert_stdout_identical(
            [
                "match",
                "--pattern-file",
                p("clips", "rthk_beep.apd.toml"),
                "--stdin",
            ],
            stdin_bytes=wav,
        )


@needs_reference
class TestShowConfigDiff:
    def test_single_pattern(self):
        assert_stdout_identical(
            ["show-config", "--pattern-file", p("clips", "rthk_beep.apd.toml")]
        )

    def test_folder(self):
        assert_stdout_identical(
            ["show-config", "--pattern-folder", p("clips")]
        )
