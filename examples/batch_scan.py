"""Example: batch-scan many audio files with one shared pattern bank.

The pattern clips are loaded, preprocessed, and compiled ONCE; each
additional file costs only its own scan (the reference's model is one
process per file, which pays pattern init + compile every run).

Run:  python examples/batch_scan.py sample_audios/clips/rthk_beep.apd.toml \
          sample_audios/rthk_section_with_beep.wav [more.wav ...]
"""

import sys

from audio_pattern_detector_tpu.match import match_pattern_many


def main() -> None:
    pattern_path, audio_paths = sys.argv[1], sys.argv[2:]

    def on_detect(name: str, ts: float) -> None:
        print(f"  detected {name} at {ts:.3f}s")

    results = match_pattern_many(
        audio_paths,
        [pattern_path],
        on_pattern_detected=on_detect,
        on_file_start=lambda src: print(f"{src}:"),
        on_file_end=lambda src, t: print(f"  ({t:.3f}s scanned)"),
        chunk_seconds_auto_perf=True,  # one chunk size from the longest file
    )
    total = sum(t for _, t in results)
    hits = sum(len(ts) for peaks, _ in results for ts in (peaks or {}).values())
    print(f"scanned {len(results)} files, {total:.1f}s audio, {hits} detections")


if __name__ == "__main__":
    main()
