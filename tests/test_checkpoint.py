"""Checkpoint/resume: O(1) stream state round-trips exactly.

The engine's inter-chunk state is (chunk_index, lookback tail, total_time)
(SURVEY.md §5). Resuming from a checkpoint must reproduce the uninterrupted
run's detections and total time exactly.
"""

import io

import numpy as np

from audio_pattern_detector_tpu import (
    AudioClip,
    AudioPatternDetector,
    AudioStream,
    StreamCheckpoint,
)

SR = 8000


def make_clip(name="clip", seed=7):
    rng = np.random.default_rng(seed)
    return AudioClip(
        name=name, audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )


def make_audio(clip, offsets, total_seconds, seed=0):
    rng = np.random.default_rng(seed)
    audio = (0.01 * rng.standard_normal(int(total_seconds * SR))).astype(np.float32)
    for off in offsets:
        o = int(off * SR)
        audio[o : o + len(clip.audio)] += clip.audio
    return audio


def stream_of(audio):
    return AudioStream(
        name="s", audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )


class TestCheckpointResume:
    def test_resume_matches_uninterrupted(self):
        clip = make_clip()
        offsets = [5.0, 25.0, 45.5, 70.0, 95.25]
        audio = make_audio(clip, offsets, 110)
        chunk_s = 20

        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        full, full_time = det.find_clip_in_audio(stream_of(audio))

        # Run the first part, capturing checkpoints.
        ckpts: list[StreamCheckpoint] = []
        cut_chunks = 3
        first_part = audio[: cut_chunks * chunk_s * SR]
        det2 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        part1, _ = det2.find_clip_in_audio(
            stream_of(first_part), on_checkpoint=ckpts.append
        )
        assert len(ckpts) == cut_chunks
        ck = ckpts[-1]
        assert ck.chunk_index == cut_chunks

        # Serialise / deserialise.
        ck = StreamCheckpoint.from_bytes(ck.to_bytes())

        # Resume on a stream positioned at the chunk boundary.
        rest = audio[cut_chunks * chunk_s * SR :]
        det3 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        part2, resumed_time = det3.find_clip_in_audio(
            stream_of(rest), checkpoint=ck
        )

        combined = sorted(part1["clip"] + part2["clip"])
        assert combined == sorted(full["clip"])
        assert resumed_time == full_time

    def test_checkpoint_roundtrip_bytes(self):
        ck = StreamCheckpoint(7, np.arange(5, dtype=np.float32), 420.5)
        rt = StreamCheckpoint.from_bytes(ck.to_bytes())
        assert rt.chunk_index == 7
        assert rt.total_time == 420.5
        np.testing.assert_array_equal(rt.previous_tail, ck.previous_tail)

    def test_first_chunk_checkpoint_none_tail(self):
        ck = StreamCheckpoint(0, None, 0.0)
        rt = StreamCheckpoint.from_bytes(ck.to_bytes())
        assert rt.previous_tail is None


class _ScriptedReader:
    """Pipe-like reader delivering a scripted chunk sequence: read(n) may
    return fewer than n bytes mid-stream (short read), like a real pipe."""

    def __init__(self, chunks):
        self._chunks = list(chunks)

    def read(self, n):
        if not self._chunks:
            return b""
        return self._chunks.pop(0)


def scripted_stream(byte_chunks):
    return AudioStream(
        name="scripted", audio_stream=_ScriptedReader(byte_chunks),
        sample_rate=SR,
    )


class TestCheckpointGuards:
    def test_resume_without_tail_at_nonzero_index_rejected(self):
        import io
        import pytest

        det = AudioPatternDetector(
            audio_clips=[make_clip()], seconds_per_chunk=20
        )
        bad = StreamCheckpoint(3, None, 60.0)
        with pytest.raises(ValueError, match="lookback tail"):
            det.find_clip_in_audio(stream_of(np.zeros(SR, np.float32)), checkpoint=bad)

    def test_negative_chunk_index_rejected(self):
        import pytest

        det = AudioPatternDetector(
            audio_clips=[make_clip()], seconds_per_chunk=20
        )
        bad = StreamCheckpoint(-1, np.zeros(SR, np.float32), 0.0)
        with pytest.raises(ValueError, match="chunk_index"):
            det.find_clip_in_audio(stream_of(np.zeros(SR, np.float32)), checkpoint=bad)


class TestShortTailResume:
    """A checkpoint whose carried tail is SHORTER than the maximum sliding
    window (the checkpointed chunk was a short segment-final chunk) must
    resume exactly like a serial run fed the same chunk sequence."""

    def test_short_mid_stream_chunk_resume_exact(self):
        clip = make_clip(seed=3)
        chunk_s = 20
        det_kwargs = dict(audio_clips=[clip], seconds_per_chunk=chunk_s)

        # Chunk script: one full chunk, one SHORT chunk (0.4 s — shorter
        # than the 1 s sliding window), then a full chunk with a detection
        # straddling nothing but landing after the short chunk.
        rng = np.random.default_rng(1)
        full1 = (0.01 * rng.standard_normal(chunk_s * SR)).astype(np.float32)
        short = (0.01 * rng.standard_normal(int(0.4 * SR))).astype(np.float32)
        full2 = (0.01 * rng.standard_normal(chunk_s * SR)).astype(np.float32)
        full1[5 * SR : 6 * SR] += clip.audio
        full2[2 * SR : 3 * SR] += clip.audio
        # A copy straddling the short-chunk/full2 boundary: starts 0.1 s
        # into the short chunk and finishes inside full2, so it is only
        # contained in full2's section via the short-chunk lookback tail.
        tail_off = int(0.1 * SR)
        head_n = len(short) - tail_off
        short[tail_off:] += clip.audio[:head_n]
        full2[: len(clip.audio) - head_n] += clip.audio[head_n:]

        serial_chunks = [c.tobytes() for c in (full1, short, full2)]
        serial, serial_time = AudioPatternDetector(
            **det_kwargs
        ).find_clip_in_audio(scripted_stream(serial_chunks))

        # Interrupted: run [full1, short], checkpoint, resume with [full2].
        ckpts = []
        AudioPatternDetector(**det_kwargs).find_clip_in_audio(
            scripted_stream([c.tobytes() for c in (full1, short)]),
            on_checkpoint=ckpts.append,
        )
        ck = StreamCheckpoint.from_bytes(ckpts[-1].to_bytes())
        assert ck.chunk_index == 2
        assert len(ck.previous_tail) == len(short)  # short tail
        part1, _ = AudioPatternDetector(**det_kwargs).find_clip_in_audio(
            scripted_stream([c.tobytes() for c in (full1, short)])
        )
        part2, resumed_time = AudioPatternDetector(
            **det_kwargs
        ).find_clip_in_audio(
            scripted_stream([full2.tobytes()]), checkpoint=ck
        )
        assert sorted(part1["clip"] + part2["clip"]) == sorted(serial["clip"])
        assert resumed_time == serial_time


class TestGoldenCorpusResume:
    """Resume-equals-uninterrupted on the real corpus (VERDICT r1 #8): every
    chunk boundary of each golden section, including a resume landing on a
    short final chunk."""

    CASES = [
        ("clips/rthk_beep.apd.toml", "rthk_section_with_beep.wav", 2),
        ("clips/cbs_news.wav", "cbs_news_audio_section.wav", 4),
        ("clips/天空下的彩虹intro.wav", "am1430_section_with_rainbow_intro.wav", 8),
    ]

    @staticmethod
    def _load(rel):
        import os
        from tests.conftest import SAMPLE_AUDIOS

        return os.path.join(SAMPLE_AUDIOS, rel)

    def _run_case(self, clip_rel, audio_rel, chunk_s):
        import wave

        from audio_pattern_detector_tpu.utils.audio_io import load_wave_file

        clip = AudioClip.from_audio_file(self._load(clip_rel), SR)
        audio = load_wave_file(self._load(audio_rel), SR)

        def det():
            return AudioPatternDetector(
                audio_clips=[clip], seconds_per_chunk=chunk_s
            )

        ckpts = []
        full, full_time = det().find_clip_in_audio(
            stream_of(audio), on_checkpoint=ckpts.append
        )
        name = clip.name
        assert len(full[name]) >= 1 or "rthk" not in audio_rel

        for ck in ckpts[:-1]:  # resume at every interior boundary
            ck = StreamCheckpoint.from_bytes(ck.to_bytes())
            cut = ck.chunk_index * chunk_s * SR
            head, _ = det().find_clip_in_audio(stream_of(audio[:cut]))
            tail, resumed_time = det().find_clip_in_audio(
                stream_of(audio[cut:]), checkpoint=ck
            )
            assert sorted(head[name] + tail[name]) == sorted(full[name]), (
                f"resume at chunk {ck.chunk_index} diverged"
            )
            assert resumed_time == full_time

    def test_rthk_marker(self):
        self._run_case(*self.CASES[0])

    def test_cbs_normal(self):
        self._run_case(*self.CASES[1])

    def test_am1430_short_final_chunk(self):
        self._run_case(*self.CASES[2])


class TestStreamBatchCheckpointResume:
    def test_stream_batch_checkpoints_resume_exact(self):
        clip = make_clip(seed=9)
        offsets = [5.0, 33.5, 61.0, 95.25]
        audio = make_audio(clip, offsets, 130, seed=2)
        chunk_s = 20
        det_kwargs = dict(audio_clips=[clip], seconds_per_chunk=chunk_s)

        full, full_time = AudioPatternDetector(**det_kwargs).find_clip_in_audio(
            stream_of(audio)
        )
        ckpts = []
        AudioPatternDetector(**det_kwargs).find_clip_in_audio(
            stream_of(audio), stream_batch=3, on_checkpoint=ckpts.append
        )
        assert len(ckpts) == -(-len(audio) // (chunk_s * SR))
        for ck in ckpts[:-1]:
            cut = ck.chunk_index * chunk_s * SR
            head, _ = AudioPatternDetector(**det_kwargs).find_clip_in_audio(
                stream_of(audio[:cut])
            )
            tail, resumed_time = AudioPatternDetector(
                **det_kwargs
            ).find_clip_in_audio(
                stream_of(audio[cut:]), checkpoint=ck, stream_batch=3
            )
            assert sorted(head["clip"] + tail["clip"]) == sorted(full["clip"])
            assert resumed_time == full_time


class TestCheckpointFileCLI:
    """--checkpoint-file surface (match.py): per-chunk atomic persistence,
    resume-with-skip on re-feed of the same source, removal on a clean
    end of stream — on the real golden corpus, not just synthetic audio."""

    def _golden(self):
        import os

        from tests.conftest import SAMPLE_AUDIOS

        wav = os.path.join(SAMPLE_AUDIOS, "rthk_section_with_beep.wav")
        toml = os.path.join(
            SAMPLE_AUDIOS, "clips", "rthk_beep.apd.toml"
        )
        return wav, toml

    def test_resume_from_file_continues_golden_run(self, tmp_path):
        import os

        from audio_pattern_detector_tpu.match import match_pattern
        from audio_pattern_detector_tpu.utils.audio_io import load_wave_file

        wav, toml = self._golden()
        chunk_s = 2
        ckfile = str(tmp_path / "resume.ck")

        full, full_time = match_pattern(
            wav, [toml], seconds_per_chunk=chunk_s
        )

        # "Interrupt" after chunk 0: run the library on the first chunk
        # and persist its checkpoint, as the CLI writer would have.
        audio = load_wave_file(wav, SR)
        clip = AudioClip.from_audio_file(toml, sample_rate=SR)
        det = AudioPatternDetector(
            audio_clips=[clip], seconds_per_chunk=chunk_s
        )
        ckpts: list[StreamCheckpoint] = []
        prefix, _ = det.find_clip_in_audio(
            stream_of(audio[: chunk_s * SR]), on_checkpoint=ckpts.append
        )
        with open(ckfile, "wb") as f:
            f.write(ckpts[-1].to_bytes())

        # Resume: same source re-fed; the processed prefix is skipped.
        resumed, resumed_time = match_pattern(
            wav, [toml], seconds_per_chunk=chunk_s, checkpoint_file=ckfile
        )

        name = clip.name
        assert sorted(prefix[name] + resumed[name]) == sorted(full[name])
        assert resumed_time == full_time
        # Clean end of stream removes the checkpoint (a leftover would
        # make the next run skip everything).
        assert not os.path.exists(ckfile)

    def test_checkpoint_written_and_removed_across_full_run(self, tmp_path):
        import os

        from audio_pattern_detector_tpu.match import match_pattern

        wav, toml = self._golden()
        ckfile = str(tmp_path / "ck.bin")
        seen: list[int] = []

        real_replace = os.replace

        def spy_replace(src, dst):
            real_replace(src, dst)
            if dst == ckfile:
                with open(ckfile, "rb") as f:
                    seen.append(
                        StreamCheckpoint.from_bytes(f.read()).chunk_index
                    )

        os.replace = spy_replace
        try:
            match_pattern(
                wav, [toml], seconds_per_chunk=2, checkpoint_file=ckfile
            )
        finally:
            os.replace = real_replace
        # One atomic write per chunk (4.078s of audio at 2s chunks = 3),
        # chunk indices monotonically increasing, file gone at the end.
        assert seen == [1, 2, 3]
        assert not os.path.exists(ckfile)

    def test_checkpoint_past_stream_end_rejected(self, tmp_path):
        import pytest

        from audio_pattern_detector_tpu.match import match_pattern

        wav, toml = self._golden()
        ckfile = str(tmp_path / "stale.ck")
        # A checkpoint claiming more audio than the source holds: the
        # resume skip must fail loudly, not silently misalign timestamps.
        bad = StreamCheckpoint(50, np.zeros(SR, np.float32), 100.0)
        with open(ckfile, "wb") as f:
            f.write(bad.to_bytes())
        with pytest.raises(ValueError, match="before the checkpoint position"):
            match_pattern(
                wav, [toml], seconds_per_chunk=2, checkpoint_file=ckfile
            )

    def test_corrupt_checkpoint_file_rejected(self, tmp_path):
        import pytest

        from audio_pattern_detector_tpu.match import match_pattern

        wav, toml = self._golden()
        ckfile = str(tmp_path / "corrupt.ck")
        with open(ckfile, "wb") as f:
            f.write(b"\x01\x02\x03")
        with pytest.raises(ValueError, match="checkpoint truncated"):
            match_pattern(
                wav, [toml], seconds_per_chunk=2, checkpoint_file=ckfile
            )

    def test_checkpoint_file_incompatible_with_offline_batch(self, tmp_path):
        import pytest

        from audio_pattern_detector_tpu.match import match_pattern

        wav, toml = self._golden()
        with pytest.raises(ValueError, match="checkpoint_file is incompatible"):
            match_pattern(
                wav,
                [toml],
                seconds_per_chunk=2,
                offline_batch=4,
                checkpoint_file=str(tmp_path / "x.ck"),
            )

    def test_resume_on_resampling_source_exact(self, tmp_path):
        """Resume must replay the engine's chunk-read partitioning.

        A non-target-rate WAV maps each read to
        ``int(target_samples · in_rate / out_rate)`` input frames and
        FFT-resamples that block (_WavFileStreamWrapper.read). Whole-
        chunk requests consume a whole number of input seconds, so the
        file position stays exact — but a skip reading arbitrary block
        sizes (the old 4 MiB slabs) truncates fractional input frames
        per block, drifting the post-resume position on >131 s resumes.
        Chunk-sized skip reads reproduce the interrupted run's request
        sequence, making the resume position exact by construction;
        this pins prefix+resume == uninterrupted on a 16 kHz source
        with detections on BOTH sides of the cut.
        """
        import os

        from audio_pattern_detector_tpu.match import (
            _WavFileStreamWrapper,
            match_pattern,
        )
        from audio_pattern_detector_tpu.ops import hostref
        from audio_pattern_detector_tpu.utils.audio_io import write_wav_file

        clip = make_clip(seed=3)
        # Hits in chunks 0, 1 (prefix) and 3, 4 (resumed part).
        audio8k = make_audio(clip, [0.5, 2.6, 7.3, 9.2], 11, seed=11)
        audio16k = hostref.resample(audio8k, 2 * len(audio8k))
        wav16 = str(tmp_path / "source_16k.wav")
        write_wav_file(wav16, audio16k, 2 * SR)
        clip_wav = str(tmp_path / "clip.wav")
        write_wav_file(clip_wav, clip.audio, SR)

        chunk_s = 2
        full, full_time = match_pattern(
            wav16, [clip_wav], seconds_per_chunk=chunk_s
        )

        # "Interrupt" after chunk 2: the prefix content must come from
        # the streaming wrapper itself (chunk-sized resample blocks).
        wrapper = _WavFileStreamWrapper(wav16, SR)
        cut_chunks = 2
        prefix_audio = np.concatenate(
            [
                np.frombuffer(wrapper.read(chunk_s * SR * 4), np.float32)
                for _ in range(cut_chunks)
            ]
        )
        wrapper.close()
        det = AudioPatternDetector(
            audio_clips=[AudioClip(name="clip", audio=clip.audio, sample_rate=SR)],
            seconds_per_chunk=chunk_s,
        )
        ckpts: list[StreamCheckpoint] = []
        prefix, _ = det.find_clip_in_audio(
            stream_of(prefix_audio), on_checkpoint=ckpts.append
        )
        ckfile = str(tmp_path / "resume16k.ck")
        with open(ckfile, "wb") as f:
            f.write(ckpts[-1].to_bytes())

        resumed, resumed_time = match_pattern(
            wav16, [clip_wav], seconds_per_chunk=chunk_s, checkpoint_file=ckfile
        )

        assert len(prefix["clip"]) == 2  # hits before the cut
        assert len(resumed["clip"]) == 2  # hits after the cut — teeth
        assert sorted(prefix["clip"] + resumed["clip"]) == sorted(full["clip"])
        assert resumed_time == full_time
        assert not os.path.exists(ckfile)
