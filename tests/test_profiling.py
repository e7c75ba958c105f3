"""Profiling counters: per-run stats populate and account consistently."""

import io

import numpy as np

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream

SR = 8000


def test_run_stats_populated():
    rng = np.random.default_rng(0)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(25 * SR)).astype(np.float32)
    audio[5 * SR : 6 * SR] += clip.audio
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    det.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), SR)
    )
    stats = det.last_run_stats
    assert stats.chunks == 3
    assert stats.audio_seconds == 25.0
    assert stats.detections == 1
    assert stats.wall_seconds > 0
    assert stats.realtime_factor() > 0
    d = stats.as_dict()
    assert set(d) >= {
        "chunks", "audio_seconds", "read_seconds", "dispatch_seconds",
        "collect_seconds", "wall_seconds", "detections", "realtime_factor",
    }
