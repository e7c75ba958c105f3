"""Cold-start decomposition for the one-pattern CLI match (VERDICT r3 #2).

Spawns a fresh subprocess that runs a one-pattern `match` on a short WAV
with phase timestamps printed from inside:

  t_import_np    - numpy + stdlib imports
  t_import_match - audio_pattern_detector_tpu.match import (pulls jax)
  t_backend      - jax.devices() backend/tunnel init
  t_clip         - pattern AudioClip load
  t_detector     - AudioPatternDetector init (bank precompute)
  t_first_chunk  - first chunk through the engine (compile or cache load)
  t_rest         - remaining chunks
  t_total        - wall

Run twice (cold cache if APD_COMPILE_CACHE points to a fresh dir, then
warm). Usage: python scripts/dev/coldstart_probe.py [--fresh-cache]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

INNER = r"""
import json, os, sys, time
t0 = time.perf_counter()
marks = {}
def mark(name):
    marks[name] = round(time.perf_counter() - t0, 3)

import numpy as np
import wave
mark("import_np")

from audio_pattern_detector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from audio_pattern_detector_tpu.match import match_pattern
mark("import_match")

import jax
jax.devices()
mark("backend")

audio_path, pattern_path = sys.argv[1], sys.argv[2]
from audio_pattern_detector_tpu.utils.clip import AudioClip
clip = AudioClip.from_audio_file(pattern_path)
mark("clip")

from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
det = AudioPatternDetector(audio_clips=[clip])
mark("detector_init")

from audio_pattern_detector_tpu.ops.packing import packed_upload_supported
packed_upload_supported()
mark("packed_probe")

det._ensure_bank()
mark("detector")

import io
from audio_pattern_detector_tpu.utils.clip import AudioStream
with wave.open(audio_path, "rb") as w:
    sr = w.getframerate()
    data = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
audio = (data.astype(np.float32) / 32768.0)
chunk_samples = int(det.seconds_per_chunk * sr)
first = audio[:chunk_samples]
bank = det._ensure_bank()
bank.process_chunk(first, None)
mark("first_chunk")

prev = first
for off in range(chunk_samples, len(audio), chunk_samples):
    c = audio[off : off + chunk_samples]
    bank.process_chunk(c, prev)
    prev = c
mark("rest")
marks["total"] = round(time.perf_counter() - t0, 3)
print(json.dumps(marks))
"""


def main() -> None:
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    with tempfile.TemporaryDirectory(prefix="apd_cold_") as td:
        import numpy as np
        import wave as wave_mod

        sr = 8000
        rng = np.random.default_rng(0)
        audio = (0.05 * rng.standard_normal(sr * 120)).astype(np.float32)
        pattern = (0.3 * rng.standard_normal(sr)).astype(np.float32)
        audio_path = os.path.join(td, "a.wav")
        pattern_path = os.path.join(td, "p.wav")
        for path, arr in ((audio_path, audio), (pattern_path, pattern)):
            with wave_mod.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(
                    np.clip(np.round(arr * 32768), -32768, 32767)
                    .astype("<i2")
                    .tobytes()
                )

        env = dict(os.environ)
        if "--fresh-cache" in sys.argv:
            env["APD_COMPILE_CACHE"] = os.path.join(td, "xla_cache")

        for run in ("run1", "run2"):
            r = subprocess.run(
                [sys.executable, "-c", INNER, audio_path, pattern_path],
                capture_output=True,
                text=True,
                cwd=repo,
                env=env,
                timeout=600,
            )
            line = next(
                (ln for ln in r.stdout.splitlines() if ln.startswith("{")), None
            )
            if line is None:
                print(r.stdout[-2000:], file=sys.stderr)
                print(r.stderr[-3000:], file=sys.stderr)
                sys.exit(1)
            print(json.dumps({run: json.loads(line)}))


if __name__ == "__main__":
    main()
