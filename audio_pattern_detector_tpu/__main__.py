"""``python -m audio_pattern_detector_tpu`` dispatches to the CLI."""

from audio_pattern_detector_tpu.cli import main

if __name__ == "__main__":
    main()
