"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The sharded detector must be result-identical to the serial engine: each
device's halo-exchanged section is bit-equal to the section the serial
loop builds for that chunk index.
"""

import io

import jax
import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream
from audio_pattern_detector_tpu.parallel import (
    ShardedDetector,
    detections_from_sharded,
    make_mesh,
)

SR = 8000

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_clip(name="c", seed=42):
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


class TestShardedMatchesSerial:
    def test_time_mesh_8(self):
        clip = make_clip()
        audio = make_audio(clip, [3.0, 25.5, 47.25, 69.0], 80)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        serial, _ = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR)
        )
        mesh = make_mesh({"time": 8})
        sd = ShardedDetector([clip], mesh, chunk_seconds=10)
        par = detections_from_sharded(sd.detect(audio[None, :]))
        assert par["c"] == serial["c"]

    def test_stream_time_mesh(self):
        clip = make_clip()
        a0 = make_audio(clip, [3.0, 47.25], 80, seed=1)
        a1 = make_audio(clip, [15.5, 62.0], 80, seed=2)
        mesh = make_mesh({"stream": 2, "time": 4})
        sd = ShardedDetector([clip], mesh, chunk_seconds=20)
        out = sd.detect(np.stack([a0, a1]))
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
        s0, _ = det.find_clip_in_audio(AudioStream("a0", io.BytesIO(a0.tobytes()), SR))
        det2 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=20)
        s1, _ = det2.find_clip_in_audio(AudioStream("a1", io.BytesIO(a1.tobytes()), SR))
        assert out["c"][0] == s0["c"]
        assert out["c"][1] == s1["c"]

    def test_marker_clip_sharded(self):
        freq = 1000.0
        m = SR // 4
        t = np.arange(m) / SR
        clip = AudioClip(
            name="beep",
            audio=np.sin(2 * np.pi * freq * t).astype(np.float32),
            sample_rate=SR,
            strategy="marker_tone",
            strategy_params={"dominant_frequency_hz": freq},
        )
        rng = np.random.default_rng(5)
        audio = (0.02 * rng.standard_normal(16 * SR)).astype(np.float32)
        for off in [3.0, 9.5]:
            o = int(off * SR)
            audio[o : o + m] += 0.7 * clip.audio
        mesh = make_mesh({"time": 4})
        sd = ShardedDetector([clip], mesh, chunk_seconds=4)
        par = detections_from_sharded(sd.detect(audio[None, :]))
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=4)
        serial, _ = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR)
        )
        assert par["beep"] == serial["beep"]

    def test_length_validation(self):
        clip = make_clip()
        mesh = make_mesh({"time": 8})
        sd = ShardedDetector([clip], mesh, chunk_seconds=10)
        with pytest.raises(ValueError, match="stream length"):
            sd.detect(np.zeros((1, 1234), np.float32))
