"""Offline batched scan produces streaming-identical results."""

import io

import numpy as np

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream

SR = 8000


def test_offline_matches_streaming():
    rng = np.random.default_rng(0)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(47 * SR)).astype(np.float32)
    for off in [3.0, 12.5, 29.0, 41.25]:
        o = int(off * SR)
        audio[o : o + SR] += clip.audio

    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    streamed, t_stream = det.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), SR)
    )
    det2 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    offline, t_off = det2.find_clip_in_array(audio, batch_size=3)

    assert offline == streamed
    assert t_off == t_stream
    # 4 embedded occurrences; the one at 29.0 sits in the lookback overlap
    # and is reported by both adjacent chunks (identical timestamps).
    assert len(set(streamed["c"])) == 4
