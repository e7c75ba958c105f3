"""stream_batch: N chunks per launch in the streaming loop, serial-identical.

The batched streaming mode (detector.find_clip_in_audio(stream_batch=N))
scan-batches N consecutive chunks into one device launch, zero-padding the
final short batch. These tests pin serial-identity across batch boundaries,
partial final batches, callback order, and checkpoint state.
"""

import io

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

SR = 8000


def _stream(audio: np.ndarray) -> AudioStream:
    return AudioStream(
        name="synt", audio_stream=io.BytesIO(audio.astype(np.float32).tobytes()),
        sample_rate=SR,
    )


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(21)
    return AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )


def _audio_with_hits(clip, seconds, offsets, seed=0):
    rng = np.random.default_rng(seed)
    audio = (0.01 * rng.standard_normal(int(seconds * SR))).astype(np.float32)
    for o in offsets:
        s = int(o * SR)
        audio[s : s + SR] += clip.audio[: min(SR, len(audio) - s)]
    return audio


@pytest.mark.parametrize("n_chunks,batch", [(6, 2), (6, 3), (5, 2), (7, 3), (1, 4)])
def test_stream_batch_serial_identical(clip, n_chunks, batch):
    """Batched streaming equals serial streaming for full and partial final
    batches (incl. hits straddling batch boundaries)."""
    chunk_s = 4
    seconds = n_chunks * chunk_s - 1.5  # final chunk short
    audio = _audio_with_hits(
        clip, seconds, [1.0, chunk_s * batch - 0.5, seconds - 2.0], seed=n_chunks
    )

    def run(sb):
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        return det.find_clip_in_audio(_stream(audio), stream_batch=sb)

    serial, t_serial = run(1)
    batched, t_batched = run(batch)
    assert batched == serial
    assert t_batched == t_serial


@pytest.mark.parametrize("mode", ["scan", "vmap"])
def test_stream_batch_modes_serial_identical(clip, mode):
    chunk_s = 4
    seconds = 6 * chunk_s - 1.5
    audio = _audio_with_hits(clip, seconds, [1.0, 7.5, seconds - 2.0], seed=42)

    def run(sb, m):
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        return det.find_clip_in_audio(
            _stream(audio), stream_batch=sb, stream_batch_mode=m
        )

    serial, t_serial = run(1, "scan")
    batched, t_batched = run(3, mode)
    assert batched == serial
    assert t_batched == t_serial


@pytest.mark.parametrize("depth", [1, 5])
def test_stream_batch_honors_pipeline_depth(clip, depth):
    """pipeline_depth composes with stream_batch (it caps in-flight
    BATCHES); results and callback order are depth-invariant."""
    chunk_s = 4
    seconds = 8 * chunk_s - 1.5
    audio = _audio_with_hits(clip, seconds, [1.0, 11.5, seconds - 2.0], seed=9)

    def run(**kwargs):
        events = []
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        peaks, total = det.find_clip_in_audio(
            _stream(audio),
            on_pattern_detected=lambda n, t: events.append((n, t)),
            **kwargs,
        )
        return peaks, total, events

    serial = run()
    assert run(stream_batch=2, pipeline_depth=depth) == serial


def test_stream_batch_mode_validation(clip):
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=4)
    with pytest.raises(ValueError, match="stream_batch_mode"):
        det.find_clip_in_audio(
            _stream(np.zeros(SR, np.float32)),
            stream_batch=2,
            stream_batch_mode="nope",
        )


def test_stream_batch_callback_order(clip):
    chunk_s = 4
    audio = _audio_with_hits(clip, 16, [1.0, 6.0, 13.0], seed=3)

    events = []
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
    det.find_clip_in_audio(
        _stream(audio),
        on_pattern_detected=lambda name, ts: events.append((name, ts)),
        stream_batch=2,
    )
    serial_events = []
    det2 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
    det2.find_clip_in_audio(
        _stream(audio),
        on_pattern_detected=lambda name, ts: serial_events.append((name, ts)),
    )
    assert events == serial_events
    assert [ts for _, ts in events] == sorted(ts for _, ts in events)


def test_stream_batch_checkpoints(clip):
    """Checkpoints fire once per REAL chunk with the serial loop's state."""
    chunk_s = 4
    audio = _audio_with_hits(clip, 14, [5.0], seed=7)

    def run(sb):
        cps = []
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=chunk_s)
        det.find_clip_in_audio(
            _stream(audio), stream_batch=sb, on_checkpoint=cps.append
        )
        return cps

    serial, batched = run(1), run(3)
    assert len(batched) == len(serial)
    for a, b in zip(serial, batched):
        assert a.chunk_index == b.chunk_index
        assert a.total_time == b.total_time
        np.testing.assert_array_equal(a.previous_tail, b.previous_tail)


def test_stream_batch_validation(clip):
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=4)
    with pytest.raises(ValueError, match="stream_batch"):
        det.find_clip_in_audio(_stream(np.zeros(SR)), stream_batch=0)
