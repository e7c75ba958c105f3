"""Example: stream detection with callbacks, checkpoints, and profiling.

Run:  python examples/detect_stream.py sample_audios/rthk_section_with_beep.wav \
          sample_audios/clips/rthk_beep.apd.toml
"""

import sys

from audio_pattern_detector_tpu import AudioClip, AudioPatternDetector, AudioStream
from audio_pattern_detector_tpu.match import _WavFileStreamWrapper


def main() -> None:
    audio_path, pattern_path = sys.argv[1], sys.argv[2]
    clip = AudioClip.from_audio_file(pattern_path)
    detector = AudioPatternDetector(audio_clips=[clip])

    wrapper = _WavFileStreamWrapper(audio_path, detector.target_sample_rate)
    stream = AudioStream(
        name=audio_path, audio_stream=wrapper,
        sample_rate=detector.target_sample_rate,
    )

    def on_detect(name: str, ts: float) -> None:
        print(f"detected {name} at {ts:.3f}s")

    checkpoints = []
    peaks, total = detector.find_clip_in_audio(
        stream,
        on_pattern_detected=on_detect,
        on_checkpoint=checkpoints.append,
    )
    wrapper.close()
    print(f"processed {total:.3f}s in {len(checkpoints)} chunks")
    print(f"stats: {detector.last_run_stats.as_dict()}")


if __name__ == "__main__":
    main()
