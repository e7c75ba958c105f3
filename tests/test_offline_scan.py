"""Offline batched scan produces streaming-identical results."""

import io

import numpy as np
import pytest

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

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


def test_offline_matches_streaming_on_resampling_source(tmp_path):
    """A 16 kHz WAV (FFT-resampled to 8 kHz by the file wrapper) must scan
    identically offline and streaming. The wrapper resamples each read
    request independently, so this holds only because the offline drain
    issues the SAME chunk-sized read requests as the streaming loop —
    arbitrary block reads would decode a different waveform
    (match.py::_drain_stream)."""
    from audio_pattern_detector_tpu.match import match_pattern
    from audio_pattern_detector_tpu.utils.audio_io import write_wav_file

    src_sr = 16000
    rng = np.random.default_rng(12)
    clip_audio = (0.4 * rng.standard_normal(SR)).astype(np.float32)
    audio16 = (0.01 * rng.standard_normal(26 * src_sr)).astype(np.float32)
    clip16 = np.repeat(clip_audio, 2)  # crude 2x upsample for embedding
    for off in [2.0, 14.5, 21.0]:
        o = int(off * src_sr)
        audio16[o : o + len(clip16)] += clip16

    clip_path = str(tmp_path / "clip.wav")
    audio_path = str(tmp_path / "audio16k.wav")
    write_wav_file(clip_path, np.clip(clip_audio, -1, 1), SR)
    write_wav_file(audio_path, np.clip(audio16, -1, 1), src_sr)

    streamed, t1 = match_pattern(audio_path, [clip_path], seconds_per_chunk=10)
    offline, t2 = match_pattern(
        audio_path, [clip_path], seconds_per_chunk=10, offline_batch=2
    )
    assert offline == streamed
    assert t1 == t2
    assert len(streamed["clip"]) >= 1  # resampled embeds still detect


def test_empty_chunk_batch_returns_empty():
    """An empty batch short-circuits to [] instead of tripping the
    packed-upload np.stack on zero rows."""
    rng = np.random.default_rng(9)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    bank = det._ensure_bank()
    assert bank.process_chunks_batch([], None) == []


def test_offline_final_batch_padded_to_one_program(monkeypatch):
    """A leftover final batch is zero-padded to ``batch_size`` so every
    dispatch reuses the ONE compiled B-row program (a B=2 remainder would
    otherwise compile a second executable), with padding results
    discarded."""
    rng = np.random.default_rng(7)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(47 * SR)).astype(np.float32)
    o = int(41.25 * SR)  # inside the final (remainder) batch
    audio[o : o + SR] += clip.audio

    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    bank = det._ensure_bank()
    seen_sizes: list[int] = []
    real_dispatch = bank.dispatch_chunks_batch

    def recording_dispatch(chunks, prev, mode="vmap", **kw):
        seen_sizes.append(len(chunks))
        return real_dispatch(chunks, prev, mode, **kw)

    monkeypatch.setattr(bank, "dispatch_chunks_batch", recording_dispatch)
    offline, _ = det.find_clip_in_array(audio, batch_size=3)

    assert seen_sizes == [3, 3]  # 5 real chunks -> batches of 3 + (2 real, 1 pad)
    det2 = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    streamed, _ = det2.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), SR)
    )
    assert offline == streamed


def test_match_pattern_offline_batch_parity(tmp_path):
    """match_pattern(offline_batch=N) equals the streaming run on a real
    WAV file, and fires the same callback events (post-scan, sorted)."""
    from audio_pattern_detector_tpu.match import match_pattern
    from audio_pattern_detector_tpu.utils.audio_io import write_wav_file

    rng = np.random.default_rng(1)
    clip_audio = (0.4 * rng.standard_normal(SR)).astype(np.float32)
    audio = (0.01 * rng.standard_normal(26 * SR)).astype(np.float32)
    for off in [2.0, 14.5, 21.0]:
        o = int(off * SR)
        audio[o : o + SR] += clip_audio

    clip_path = str(tmp_path / "clip.wav")
    audio_path = str(tmp_path / "audio.wav")
    write_wav_file(clip_path, np.clip(clip_audio, -1, 1), SR)
    write_wav_file(audio_path, np.clip(audio, -1, 1), SR)

    stream_events: list = []
    streamed, t1 = match_pattern(
        audio_path, [clip_path], seconds_per_chunk=10,
        on_pattern_detected=lambda n, t: stream_events.append((n, t)),
    )
    offline_events: list = []
    offline, t2 = match_pattern(
        audio_path, [clip_path], seconds_per_chunk=10, offline_batch=2,
        on_pattern_detected=lambda n, t: offline_events.append((n, t)),
    )
    assert offline == streamed
    assert t1 == t2
    assert sorted(offline_events) == sorted(stream_events)
    assert len(streamed["clip"]) == 3


def test_scan_mode_matches_vmap_and_streaming():
    """batch_mode='scan' (one launch, sequential on-device) must equal the
    vmapped batch and the streaming loop exactly."""
    rng = np.random.default_rng(3)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(47 * SR)).astype(np.float32)
    for off in [3.0, 12.5, 29.0, 41.25]:
        o = int(off * SR)
        audio[o : o + SR] += clip.audio

    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    streamed, t0 = det.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), SR)
    )
    det_v = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    vmapped, t1 = det_v.find_clip_in_array(audio, batch_size=3, batch_mode="vmap")
    det_s = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    scanned, t2 = det_s.find_clip_in_array(audio, batch_size=3, batch_mode="scan")
    assert scanned == vmapped == streamed
    assert t0 == t1 == t2


def test_scan_unroll_cap_wide_batch_identical(monkeypatch):
    """Past _SCAN_UNROLL_CAP the scan program switches from straight-line
    unrolling to a short outer lax.scan of cap-wide unrolled steps (a
    B=128 batch must not compile a 128x-unrolled executable). Capped at
    4 with B=10 (remainder 2), results must equal streaming exactly."""
    from audio_pattern_detector_tpu.models import bank as bank_mod
    import jax

    monkeypatch.setattr(bank_mod, "_SCAN_UNROLL_CAP", 4)
    # The cap is read at TRACE time and is not part of the jit cache
    # key: if an identically-shaped scan program were already compiled
    # in this process, the cached cap-32 executable would be silently
    # reused and the capped schedule would go untested. Clear the jit
    # cache so the trace must happen here, and spy on lax.scan's unroll
    # argument to PROVE the capped schedule was actually traced.
    jax.clear_caches()
    real_scan = jax.lax.scan
    seen_unrolls: list = []

    def spy_scan(*args, **kwargs):
        seen_unrolls.append(kwargs.get("unroll"))
        return real_scan(*args, **kwargs)

    monkeypatch.setattr(jax.lax, "scan", spy_scan)

    rng = np.random.default_rng(17)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(47 * SR)).astype(np.float32)
    for off in [3.0, 12.5, 29.0, 41.25]:
        o = int(off * SR)
        audio[o : o + SR] += clip.audio

    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
    streamed, t0 = det.find_clip_in_audio(
        AudioStream("s", io.BytesIO(audio.tobytes()), SR)
    )
    det_s = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
    scanned, t1 = det_s.find_clip_in_array(audio, batch_size=10, batch_mode="scan")
    assert scanned == streamed
    assert t0 == t1
    assert len(set(streamed["c"])) == 4
    # Proof the capped outer-scan schedule ran: the batch program's
    # lax.scan traced with unroll=min(B=10, cap=4)=4.
    assert 4 in seen_unrolls, seen_unrolls


def test_invalid_batch_mode_rejected():
    import pytest

    clip = AudioClip(name="c", audio=np.zeros(SR, np.float32), sample_rate=SR)
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    with pytest.raises(ValueError, match="mode"):
        det.find_clip_in_array(np.zeros(20 * SR, np.float32), batch_mode="turbo")


def test_pipeline_depth_identical_results():
    """pipeline_depth > 1 keeps more chunks in flight but must produce the
    exact same detections, ordering, and callback sequence."""
    rng = np.random.default_rng(2)
    clip = AudioClip(
        name="c", audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    audio = (0.01 * rng.standard_normal(52 * SR)).astype(np.float32)
    for off in [1.0, 9.5, 19.0, 31.0, 44.0]:
        o = int(off * SR)
        audio[o : o + SR] += clip.audio

    runs = {}
    for depth in (1, 3, 8):
        events: list = []
        det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
        peaks, total = det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(audio.tobytes()), SR),
            on_pattern_detected=lambda n, t: events.append((n, t)),
            pipeline_depth=depth,
        )
        runs[depth] = (peaks, total, events)
    assert runs[3] == runs[1]
    assert runs[8] == runs[1]
    assert len(runs[1][0]["c"]) >= 5


def test_pipeline_depth_validation():
    import pytest

    clip = AudioClip(
        name="c", audio=np.zeros(SR, dtype=np.float32), sample_rate=SR
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=10)
    with pytest.raises(ValueError, match="pipeline_depth"):
        det.find_clip_in_audio(
            AudioStream("s", io.BytesIO(b""), SR), pipeline_depth=0
        )


def test_offline_batch_rejects_stdin_mode():
    import pytest

    from audio_pattern_detector_tpu.match import match_pattern

    with pytest.raises(ValueError, match="offline_batch"):
        match_pattern(None, ["x.wav"], from_stdin=True, offline_batch=4)


def test_match_pattern_rejects_non_positive_pipeline_depth():
    """An explicit --pipeline-depth 0 must error at the options layer, not
    be silently coerced to the default in-flight cap."""
    import pytest

    from audio_pattern_detector_tpu.match import match_pattern

    for bad in (0, -1):
        with pytest.raises(ValueError, match="pipeline_depth"):
            match_pattern(
                None, ["x.wav"], from_stdin=True, pipeline_depth=bad
            )


def test_payload_staging_buffers_recycle():
    """The dispatch staging pool (bank._payload_pool) must actually
    recycle — repeated batch scans reuse page-warm buffers instead of
    fresh multi-MB np.empty every round (round 5: fresh allocation paid
    full mmap first-touch page faults per round) — and recycled buffers
    must carry each scan's OWN samples: the second scan uses different
    audio with a hit at a different offset, so a stale-content bug
    (aliasing misuse or a host-buffer identity cache) would move or
    lose detections, not pass silently."""
    rng = np.random.default_rng(9)
    clip = AudioClip(
        name="c",
        audio=(0.4 * rng.standard_normal(SR)).astype(np.float32),
        sample_rate=SR,
    )
    det = AudioPatternDetector(audio_clips=[clip], seconds_per_chunk=5)
    bank = det._ensure_bank()
    audio1 = (0.01 * rng.standard_normal(30 * SR)).astype(np.float32)
    audio1[12 * SR : 13 * SR] += clip.audio
    audio2 = (0.01 * rng.standard_normal(30 * SR)).astype(np.float32)
    audio2[21 * SR : 22 * SR] += clip.audio

    r1, _ = det.find_clip_in_array(audio1, batch_size=3)
    assert bank._payload_pool, "no staging buffers returned to the pool"
    pooled = {k: [id(b) for b in v] for k, v in bank._payload_pool.items()}
    r2, _ = det.find_clip_in_array(audio2, batch_size=3)
    # Fresh contents flowed through the recycled buffers: each scan
    # found its own hit where it was embedded.
    assert any(abs(t - 12.0) < 0.01 for t in r1["c"]), r1
    assert any(abs(t - 21.0) < 0.01 for t in r2["c"]), r2
    assert not any(abs(t - 12.0) < 0.01 for t in r2["c"]), r2
    # And at least one buffer object from the first scan was reused by
    # the second (identity — the same ndarray cycled through the pool).
    reused = any(
        id(b) in ids
        for k, ids in pooled.items()
        for b in bank._payload_pool.get(k, [])
    )
    assert reused, "second scan did not reuse any pooled staging buffer"
