"""Multi-file ``match``: many audio files scanned against one shared
pattern bank in a single process (a batch-scanning surface the
reference's one-process-per-file model lacks; single-file behaviour is
byte-identical to the reference contract and pinned elsewhere).
"""

from __future__ import annotations

import argparse
import io
import json
import sys

import numpy as np
import pytest

from audio_pattern_detector_tpu.match import (
    cmd_match,
    match_pattern,
    match_pattern_many,
)

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

RTHK_AUDIO = "sample_audios/rthk_section_with_beep.wav"
CBS_AUDIO = "sample_audios/cbs_news_audio_section.wav"
RTHK_PATTERN = "sample_audios/clips/rthk_beep.apd.toml"
CBS_PATTERN = "sample_audios/clips/cbs_news.wav"


def _args(audio_files, pattern_files, **over):
    ns = argparse.Namespace(
        audio_file=audio_files,
        pattern_file=pattern_files,
        pattern_folder=None,
        stdin=False,
        multiplexed_stdin=False,
        target_sample_rate=None,
        timestamp_format="both",
        chunk_seconds=None,
        debug=False,
        debug_dir="./tmp",
        height_min=None,
        profile=False,
        trace_dir=None,
        offline_batch=None,
        offline_batch_mode="vmap",
        pipeline_depth=None,
        stream_batch=1,
        stream_batch_mode="scan",
        mesh_time=None,
        mesh_bank=1,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def _run_cli(capsys, audio_files, pattern_files, **over):
    cmd_match(_args(audio_files, pattern_files, **over))
    return [
        json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.strip()
    ]


def _blocks(events):
    """Split a JSONL event stream into per-file [start..end] blocks."""
    blocks = []
    for ev in events:
        if ev["type"] == "start":
            blocks.append([ev])
        else:
            blocks[-1].append(ev)
    return blocks


class TestMultiFileCli:
    def test_two_files_two_blocks_golden_timestamps(self, capsys):
        events = _run_cli(
            capsys, [RTHK_AUDIO, CBS_AUDIO], [RTHK_PATTERN, CBS_PATTERN]
        )
        blocks = _blocks(events)
        assert len(blocks) == 2

        rthk, cbs = blocks
        assert rthk[0] == {"type": "start", "source": RTHK_AUDIO}
        assert [e["timestamp_ms"] for e in rthk[1:-1]] == [1408, 2420]
        assert all(e["clip_name"] == "rthk_beep" for e in rthk[1:-1])
        assert rthk[-1]["type"] == "end"
        assert rthk[-1]["total_time_ms"] == 4078

        assert cbs[0] == {"type": "start", "source": CBS_AUDIO}
        assert [(e["clip_name"], e["timestamp_ms"]) for e in cbs[1:-1]] == [
            ("cbs_news", 25899)
        ]
        assert cbs[-1]["total_time_ms"] == 32122

    def test_single_file_list_matches_scalar_path(self, capsys):
        """One-element list takes the unchanged single-file path."""
        events = _run_cli(capsys, [RTHK_AUDIO], [RTHK_PATTERN])
        assert [e["type"] for e in events] == [
            "start", "pattern_detected", "pattern_detected", "end",
        ]

    def test_dedup_state_resets_per_file(self, capsys):
        """The same file twice emits its detections twice: equal-ms dedup
        is per file, exactly as two single-file runs would emit."""
        events = _run_cli(capsys, [RTHK_AUDIO, RTHK_AUDIO], [RTHK_PATTERN])
        blocks = _blocks(events)
        assert len(blocks) == 2
        for blk in blocks:
            assert [e["timestamp_ms"] for e in blk[1:-1]] == [1408, 2420]

    def test_missing_file_fails_before_any_output(self, capsys):
        with pytest.raises(ValueError, match="does not exist"):
            cmd_match(
                _args([RTHK_AUDIO, "/nonexistent/x.wav"], [RTHK_PATTERN])
            )
        assert capsys.readouterr().out == ""

    def test_debug_rejected_for_multiple_files(self, capsys):
        with pytest.raises(SystemExit):
            cmd_match(
                _args([RTHK_AUDIO, CBS_AUDIO], [RTHK_PATTERN], debug=True)
            )


class TestMatchPatternMany:
    def test_results_equal_per_file_match_pattern(self):
        many = match_pattern_many(
            [RTHK_AUDIO, CBS_AUDIO],
            [RTHK_PATTERN, CBS_PATTERN],
            accumulate_results=True,
        )
        singles = [
            match_pattern(
                src, [RTHK_PATTERN, CBS_PATTERN], accumulate_results=True
            )
            for src in (RTHK_AUDIO, CBS_AUDIO)
        ]
        assert many == singles

    def test_file_boundary_callbacks_in_order(self):
        seen: list = []
        match_pattern_many(
            [RTHK_AUDIO, CBS_AUDIO],
            [RTHK_PATTERN, CBS_PATTERN],
            accumulate_results=False,
            on_file_start=lambda s: seen.append(("start", s)),
            on_file_end=lambda s, t: seen.append(("end", s, round(t, 3))),
        )
        assert seen == [
            ("start", RTHK_AUDIO),
            ("end", RTHK_AUDIO, 4.078),
            ("start", CBS_AUDIO),
            ("end", CBS_AUDIO, 32.122),
        ]

    def test_empty_sources_rejected(self):
        with pytest.raises(ValueError, match="No audio sources"):
            match_pattern_many([], [RTHK_PATTERN])

    def test_composes_with_mesh_sharding(self):
        """Multi-file + --mesh-time: every file scans through the sharded
        session with results identical to the serial engine."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        many = match_pattern_many(
            [RTHK_AUDIO, CBS_AUDIO],
            [RTHK_PATTERN, CBS_PATTERN],
            accumulate_results=True,
            mesh_time=2,
        )
        serial = [
            match_pattern(
                src, [RTHK_PATTERN, CBS_PATTERN], accumulate_results=True
            )
            for src in (RTHK_AUDIO, CBS_AUDIO)
        ]
        assert many == serial

    def test_mesh_sharded_detector_built_once_across_files(self, monkeypatch):
        """Multi-file + mesh must share ONE ShardedDetector (and its
        compiled sharded programs) across files — rebuilding per file
        pays the full sharded trace+compile for every file, the exact
        cold-start cost multi-file mode exists to amortise."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        from audio_pattern_detector_tpu.parallel import sequence

        builds = []
        orig_init = sequence.ShardedDetector.__init__

        def counting_init(self, *args, **kwargs):
            builds.append(1)
            orig_init(self, *args, **kwargs)

        monkeypatch.setattr(sequence.ShardedDetector, "__init__", counting_init)
        match_pattern_many(
            [RTHK_AUDIO, RTHK_AUDIO, CBS_AUDIO],
            [RTHK_PATTERN, CBS_PATTERN],
            accumulate_results=True,
            mesh_time=2,
        )
        assert len(builds) == 1

    def test_opts_for_source_ffmpeg_height_min_contract(self):
        """The reference constructs its ffmpeg-path detector without
        height_min (reference: match.py:191-212); WAV sources keep it."""
        from audio_pattern_detector_tpu.match import (
            EngineOptions,
            _opts_for_source,
        )

        opts = EngineOptions(height_min=0.4)
        assert _opts_for_source(opts, "a.wav") is opts
        assert _opts_for_source(opts, "a.WAV") is opts
        ff = _opts_for_source(opts, "a.mp3")
        assert ff is not opts and ff.height_min is None
        assert opts.height_min == 0.4  # original untouched

        plain = EngineOptions()
        assert _opts_for_source(plain, "a.mp3") is plain

    def test_auto_perf_shares_one_chunk_size(self):
        """Auto-perf sizes once from the longest file; detections are
        chunk-size-invariant so results still equal per-file runs."""
        many = match_pattern_many(
            [RTHK_AUDIO, CBS_AUDIO],
            [RTHK_PATTERN, CBS_PATTERN],
            accumulate_results=True,
            chunk_seconds_auto_perf=True,
        )
        singles = [
            match_pattern(
                src, [RTHK_PATTERN, CBS_PATTERN], accumulate_results=True
            )
            for src in (RTHK_AUDIO, CBS_AUDIO)
        ]
        assert many == singles


class TestMeshStreamParallel:
    """``--mesh-stream N``: data parallelism over FILES. Files scan
    concurrently (MultiStreamSession rows partitioned across a 'stream'
    mesh axis); CLI stdout must be BYTE-identical to the sequential
    multi-file runner, library results identical to per-file runs."""

    FILES = [CBS_AUDIO, RTHK_AUDIO, RTHK_AUDIO]  # file 0 finishes LAST
    PATTERNS = [RTHK_PATTERN, CBS_PATTERN]

    def _mesh_ok(self, n):
        import jax

        return len(jax.devices()) >= n

    def test_cli_stdout_byte_identical_to_sequential(self, capsys):
        """Different-length files force out-of-order completion; the
        emission cursor must still produce the sequential byte stream."""
        if not self._mesh_ok(2):
            pytest.skip("needs a multi-device mesh")
        cmd_match(_args(list(self.FILES), list(self.PATTERNS)))
        sequential = capsys.readouterr().out
        cmd_match(
            _args(list(self.FILES), list(self.PATTERNS), mesh_stream=2)
        )
        parallel = capsys.readouterr().out
        assert parallel == sequential

    def test_library_results_equal_per_file(self):
        if not self._mesh_ok(2):
            pytest.skip("needs a multi-device mesh")
        from audio_pattern_detector_tpu.match import (
            match_pattern_many_parallel,
        )

        par = match_pattern_many_parallel(
            list(self.FILES), list(self.PATTERNS),
            mesh_stream=2, accumulate_results=True,
        )
        singles = [
            match_pattern(src, list(self.PATTERNS), accumulate_results=True)
            for src in self.FILES
        ]
        assert par == singles

    def test_slot_recycling_and_indexed_callbacks(self):
        """5 files through 2 slots: every file gets start/end callbacks
        carrying its input index (repeated sources stay distinguishable),
        and ends fire once per file."""
        if not self._mesh_ok(2):
            pytest.skip("needs a multi-device mesh")
        from audio_pattern_detector_tpu.match import (
            match_pattern_many_parallel,
        )

        files = [RTHK_AUDIO, RTHK_AUDIO, CBS_AUDIO, RTHK_AUDIO, RTHK_AUDIO]
        events: list = []
        match_pattern_many_parallel(
            files, list(self.PATTERNS), mesh_stream=2,
            accumulate_results=False,
            on_file_start=lambda i, s: events.append(("start", i)),
            on_file_detect=lambda i, s, c, t: events.append(("det", i, c)),
            on_file_end=lambda i, s, t: events.append(("end", i, round(t, 3))),
        )
        starts = [e[1] for e in events if e[0] == "start"]
        ends = {e[1]: e[2] for e in events if e[0] == "end"}
        assert sorted(starts) == [0, 1, 2, 3, 4]
        assert starts[:2] == [0, 1], "slots assign in input order"
        assert ends == {0: 4.078, 1: 4.078, 2: 32.122, 3: 4.078, 4: 4.078}
        # Detections only between their file's start and end.
        for i in (0, 1, 3, 4):
            dets = [e for e in events if e[0] == "det" and e[1] == i]
            assert len(dets) >= 2 and all(c == "rthk_beep" for _, _, c in dets)

    def test_single_device_batching_without_mesh(self):
        """mesh_stream=1 via the library still batches files per round
        (n_slots > 1) with identical results — the no-mesh degenerate."""
        from audio_pattern_detector_tpu.match import (
            match_pattern_many_parallel,
        )

        par = match_pattern_many_parallel(
            list(self.FILES), list(self.PATTERNS),
            mesh_stream=1, n_slots=3, accumulate_results=True,
        )
        singles = [
            match_pattern(src, list(self.PATTERNS), accumulate_results=True)
            for src in self.FILES
        ]
        assert par == singles

    def test_cli_single_file_rejected(self, capsys):
        with pytest.raises(SystemExit):
            cmd_match(_args([RTHK_AUDIO], [RTHK_PATTERN], mesh_stream=2))
        assert "MULTIPLE audio files" in capsys.readouterr().err

    def test_cli_incompatible_flags_rejected(self, capsys):
        with pytest.raises(SystemExit):
            cmd_match(
                _args(
                    [RTHK_AUDIO, CBS_AUDIO], [RTHK_PATTERN],
                    mesh_stream=2, mesh_time=2,
                )
            )
        assert "incompatible" in capsys.readouterr().err

    def test_invalid_slot_multiple_rejected(self):
        from audio_pattern_detector_tpu.match import (
            match_pattern_many_parallel,
        )

        with pytest.raises(ValueError, match="multiple of"):
            match_pattern_many_parallel(
                list(self.FILES), list(self.PATTERNS),
                mesh_stream=2, n_slots=3,
            )

    def test_cli_stdin_rejected(self, capsys, monkeypatch):
        """--mesh-stream with --stdin must error loudly, not silently run
        the serial stdin loop (the flag would otherwise be ignored)."""
        with pytest.raises(SystemExit):
            cmd_match(
                _args(None, [RTHK_PATTERN], stdin=True, mesh_stream=2)
            )
        assert "--mesh-stream requires file mode" in capsys.readouterr().err

    def test_trace_dir_rejected(self, capsys):
        """--trace-dir is not forwarded by the parallel path; like
        --profile it must error rather than silently drop the trace."""
        with pytest.raises(SystemExit):
            cmd_match(
                _args(
                    [RTHK_AUDIO, CBS_AUDIO], [RTHK_PATTERN],
                    mesh_stream=2, trace_dir="/tmp/tr",
                )
            )
        assert "incompatible" in capsys.readouterr().err

    def test_exception_closes_open_slots(self, monkeypatch):
        """An exception escaping the drive loop (e.g. a device error in
        collect) must close every open slot's stream stack — no leaked
        WAV handles / ffmpeg children."""
        from audio_pattern_detector_tpu.match import (
            match_pattern_many_parallel,
        )
        from audio_pattern_detector_tpu.models import multistream

        closed = []
        orig_close = (
            __import__("audio_pattern_detector_tpu.match", fromlist=["x"])
            ._WavFileStreamWrapper.close
        )

        def tracking_close(self):
            closed.append(1)
            orig_close(self)

        monkeypatch.setattr(
            "audio_pattern_detector_tpu.match._WavFileStreamWrapper.close",
            tracking_close,
        )

        def boom(self, handle):
            raise RuntimeError("device fell over")

        monkeypatch.setattr(
            multistream.MultiStreamSession, "collect", boom
        )
        with pytest.raises(RuntimeError, match="device fell over"):
            match_pattern_many_parallel(
                [RTHK_AUDIO, RTHK_AUDIO], [RTHK_PATTERN],
                mesh_stream=1, n_slots=2,
            )
        assert len(closed) == 2, "both slots' wrappers must close"

    def test_mixed_wav_ffmpeg_sources_two_detector_groups(
        self, tmp_path, monkeypatch, capsys
    ):
        """Non-WAV sources drop --height-min (reference contract), so a
        mixed file list runs TWO parallel sessions (one per detector
        variant) with interleaved input indices — the emission cursor
        must still produce the sequential byte stream. ffmpeg is shimmed
        (absent in this image) with the WAV wrapper, which satisfies the
        same raw-f32 stream contract."""
        import shutil
        from contextlib import contextmanager

        from audio_pattern_detector_tpu import match as m

        fake_mp3 = tmp_path / "rthk_copy.mp3"  # WAV bytes, non-.wav name
        shutil.copy(RTHK_AUDIO, fake_mp3)

        @contextmanager
        def fake_ffmpeg(path, target_sample_rate, ac=1):
            w = m._WavFileStreamWrapper(path, target_sample_rate)
            try:
                yield w
            finally:
                w.close()

        monkeypatch.setattr(m, "ffmpeg_get_float32_pcm", fake_ffmpeg)
        files = [str(fake_mp3), RTHK_AUDIO, str(fake_mp3)]
        cmd_match(
            _args(list(files), [RTHK_PATTERN], height_min=0.25)
        )
        sequential = capsys.readouterr().out
        cmd_match(
            _args(
                list(files), [RTHK_PATTERN],
                height_min=0.25, mesh_stream=2,
            )
        )
        parallel = capsys.readouterr().out
        assert parallel == sequential
        blocks = _blocks(
            [json.loads(ln) for ln in parallel.splitlines() if ln.strip()]
        )
        assert [b[0]["source"] for b in blocks] == files
        for blk in blocks:
            assert [e["timestamp_ms"] for e in blk[1:-1]] == [1408, 2420]
