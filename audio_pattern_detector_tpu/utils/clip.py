"""Clip and stream models.

Functional parity with the reference clip layer
(reference: audio_pattern_detector/audio_clip.py): a frozen ``AudioClip``
value object carrying float32 audio plus an optional verification strategy,
and ``AudioStream`` — any named readable byte stream of float32 mono PCM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Protocol

import numpy as np
from numpy.typing import NDArray

from audio_pattern_detector_tpu.utils.audio_io import (
    DEFAULT_TARGET_SAMPLE_RATE,
    load_wav_from_bytes,
    load_wave_file,
    resample_audio,
)
from audio_pattern_detector_tpu.utils.pattern_config import APD_EXTENSION, load_apd_file


class ReadableStream(Protocol):
    """Anything with a bytes ``read(size)``."""

    def read(self, size: int, /) -> bytes: ...


@dataclass(frozen=True)
class AudioClip:
    name: str
    audio: NDArray[np.float32]
    sample_rate: int
    # Non-None when loaded from an `.apd.toml` pattern config; selects the
    # Step-2 verification path (e.g. "marker_tone").
    strategy: str | None = None
    strategy_params: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_audio_file(clip_path: "str | Path", sample_rate: int | None = None) -> "AudioClip":
        """Load a clip; `.apd.toml` files parse as pattern configs, other
        extensions decode as audio."""
        if sample_rate is None:
            sample_rate = DEFAULT_TARGET_SAMPLE_RATE
        path_str = str(clip_path)
        if path_str.lower().endswith(APD_EXTENSION):
            # Strip the compound extension ("x.apd.toml" -> "x").
            clip_name = Path(path_str[: -len(APD_EXTENSION)]).name
            config = load_apd_file(clip_path, sample_rate=sample_rate)
            return AudioClip(
                name=clip_name,
                audio=config.audio,
                sample_rate=sample_rate,
                strategy=config.strategy,
                strategy_params=config.strategy_params,
            )
        clip_name = Path(clip_path).stem
        clip = load_wave_file(path_str, expected_sample_rate=sample_rate)
        return AudioClip(name=clip_name, audio=clip, sample_rate=sample_rate)

    @staticmethod
    def from_wav_bytes(
        wav_bytes: bytes, name: str, sample_rate: int | None = None
    ) -> "AudioClip":
        """Load a clip from in-memory WAV bytes, resampling to target rate."""
        if sample_rate is None:
            sample_rate = DEFAULT_TARGET_SAMPLE_RATE
        audio, source_sr = load_wav_from_bytes(wav_bytes, name)
        if source_sr != sample_rate:
            audio = resample_audio(audio, source_sr, sample_rate)
        return AudioClip(name=name, audio=audio, sample_rate=sample_rate)

    def clip_length_seconds(self) -> float:
        return len(self.audio) / self.sample_rate


@dataclass(frozen=True)
class AudioStream:
    name: str
    audio_stream: ReadableStream  # raw float32 mono PCM bytes at sample_rate
    sample_rate: int
