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
