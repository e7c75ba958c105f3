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

# Full-lane suite (pyproject addopts -m 'not slow'); run with pytest -m "".
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
]


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
        with pytest.raises(ValueError, match="positive"):
            sd.detect(np.zeros((1, 0), np.float32))

    def test_slab_beyond_int32_rejected(self):
        clip = make_clip()
        mesh = make_mesh({"time": 8})
        # 8 devices x 2^28 s x 8 kHz >> 2^31 samples per slab.
        with pytest.raises(ValueError, match="int32"):
            ShardedDetector([clip], mesh, chunk_seconds=2**28)

    def test_sample_count_f32_split_exact_beyond_2_24(self):
        # The valid-sample count crosses host->device as an f32 (hi, lo)
        # pair because a single f32 rounds integers >= 2^24. The split must
        # reconstruct exactly for every count up to the int32 guard.
        for t in [2**24 - 1, 2**24, 2**24 + 1, 30_719_999, 2**31 - 1]:
            hi = np.float32(t >> 12)
            lo = np.float32(t & 0xFFF)
            assert int(hi) * 4096 + int(lo) == t


class TestShardedStreaming:
    """Slab-carry streaming: successive feeds must equal one serial scan."""

    def test_two_slabs_equal_serial(self):
        clip = make_clip()
        # 4-device x 5 s chunks = 20 s slabs; 40 s stream = 2 slabs, with
        # one match straddling the slab boundary's lookback region.
        audio = make_audio(clip, [3.0, 19.5, 21.25, 33.0], 40)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
        serial, _ = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR)
        )
        mesh = make_mesh({"time": 4})
        sd = ShardedDetector([clip], mesh, chunk_seconds=5)
        sess = sd.session()
        r1 = sess.feed(audio[None, : 20 * SR])
        r2 = sess.feed(audio[None, 20 * SR :])
        got = sorted(r1["c"][0] + r2["c"][0])
        assert got == serial["c"]

    def test_short_final_slab_equal_serial(self):
        clip = make_clip()
        # 27 s stream on a 4x5 s mesh: slab 1 full (20 s), slab 2 is 7 s —
        # one full chunk + a 2 s final short chunk + two idle devices.
        audio = make_audio(clip, [3.0, 21.0, 25.5], 27)
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
        serial, _ = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR)
        )
        mesh = make_mesh({"time": 4})
        sd = ShardedDetector([clip], mesh, chunk_seconds=5)
        par = detections_from_sharded(sd.detect(audio))
        assert par["c"] == serial["c"]

    def test_feed_after_short_slab_rejected(self):
        clip = make_clip()
        mesh = make_mesh({"time": 4})
        sd = ShardedDetector([clip], mesh, chunk_seconds=5)
        sess = sd.session()
        sess.feed(np.zeros((1, 7 * SR), np.float32))
        with pytest.raises(ValueError, match="finished"):
            sess.feed(np.zeros((1, 20 * SR), np.float32))


class TestShardedOverflowFallback:
    def test_sharded_overflow_reroutes_to_host(self, monkeypatch):
        """Verify-tier overflow on a (stream, device, clip) cell must
        re-run that cell's exact section on the host path, keeping the
        sharded scan serial-engine-identical (not silently dropping
        peaks). The in-program greedy survivors resolve dense candidate
        combs directly, so forcing overflow needs k_verify below the
        per-cell survivor count (~5 here), not merely a dense comb."""
        from audio_pattern_detector_tpu.models import hostpath

        rng = np.random.default_rng(0)
        clip = make_clip()
        sd = ShardedDetector([clip], make_mesh({"time": 4}), chunk_seconds=5)
        bank = sd.bank

        # Shrink the verify tier below the survivor count so it overflows.
        g = bank.classes[1]["groups"][0]
        g.k_detect = 8
        g.k_verify = 2
        bank._metas[1] = (("normal", g.clip_len, 8, 2),)

        audio = (0.01 * rng.standard_normal(20 * SR)).astype(np.float32)
        for k in range(24):
            o = int((0.2 + 0.75 * k) * SR)
            audio[o : o + SR] += clip.audio[: min(SR, 20 * SR - o)]

        calls = []
        original = hostpath.process_section_host

        def spy(*args, **kwargs):
            calls.append(1)
            return original(*args, **kwargs)

        monkeypatch.setattr(hostpath, "process_section_host", spy)

        par = detections_from_sharded(sd.detect(audio))
        assert calls, "sharded overflow did not reroute to the host path"

        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
        serial, _ = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR)
        )
        assert par["c"] == serial["c"]
