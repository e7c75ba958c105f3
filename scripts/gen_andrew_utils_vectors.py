"""Generate vendored golden vectors for ``andrew_utils.seconds_to_time``.

Run this in any environment where the REAL third-party package is
installed (``pip install andrew-utils --index-url
https://andrewtheguy.github.io/andrew_utils/simple/``) and commit the
resulting ``tests/golden/andrew_utils_vectors.json``. The offline test
suite then pins ``utils/timefmt.py`` against the recorded outputs
(tests/test_utils_misc.py::test_matches_vendored_golden_vectors) instead
of skipping — closing the structural blind spot where both sides of the
reference-diff harness share this repo's formatter (reference usage:
/root/reference/audio_pattern_detector/match.py:17,536,596).

The value matrix covers: zero, sub-millisecond rounding edges (both sides
of the half-ms point), carry across second/minute/hour boundaries, the
24 h and >99 h regimes, ``include_decimals=False`` truncation edges, and
seeded uniform randoms over [0, 400000) s.

Usage:  python scripts/gen_andrew_utils_vectors.py [out.json]
"""

from __future__ import annotations

import importlib.metadata
import json
import platform
import sys
from datetime import datetime, timezone
from pathlib import Path

EDGE_VALUES = [
    0.0,
    0.0004,
    0.0005,
    0.0006,
    0.001,
    0.9994,
    0.9995,
    0.9996,
    1.0,
    1.407375,
    2.419125,
    13.848,
    25.89875,
    59.999,
    59.9994,
    59.9995,
    59.9999,
    60.0,
    3599.999,
    3599.9994,
    3599.9995,
    3599.9996,
    3600.0,
    86399.999,
    86399.9995,
    86400.0,
    86400.001,
    359999.999,
    359999.9995,
    359999.9999,
    360000.0,
    360000.5,
    360000.9,
    1e7,
    # Adversarial edges (round 5): exact-half-ms points where Python's
    # banker's rounding and decimal-string rounding can disagree (the
    # nearest float64 to x.xxx5 sits on either side of the true half),
    # sub-ms dust, float-representation boundaries just under a carry,
    # and the no-decimals truncation edge at every field boundary.
    0.0015,
    0.0025,  # float64(0.0025) is just below the true half → down?
    0.0035,
    0.1235,
    0.6665,
    1.9995,
    2.0005,
    59.0005,
    59.4995,
    59.5005,
    1e-9,
    1e-4,
    4.9999999999999,  # nearest float64 below 5.0
    59.99999999999999,
    3599.9999999999995,
    0.9989999999999999,
    119.999,
    7199.9995,
    35999.9995,  # 10 h field carry
    215999.9995,  # 60 h
    1234567.891,  # >300 h regime
    86399.49949999,
    86400.5,
    90000.0005,
]

# Values whose BEHAVIOUR (string vs exception) is unknown offline: the
# reference never passes negatives, and this repo's reimplementation
# rejects them (ValueError). Recorded separately so a pinning test can
# compare outcome kinds without guessing.
BEHAVIOR_VALUES = [-1.0, -0.0005, -0.0, float("nan"), float("inf")]


def build_values() -> list[float]:
    import numpy as np

    rng = np.random.default_rng(20260819)
    randoms = rng.uniform(0.0, 400_000.0, size=512).tolist()
    return EDGE_VALUES + randoms


def main() -> int:
    try:
        import andrew_utils
    except ImportError:
        print(
            "error: the real andrew_utils package is not installed; this "
            "generator must run where it is (it records ground truth, it "
            "does not re-derive it)",
            file=sys.stderr,
        )
        return 1

    try:
        version = importlib.metadata.version("andrew-utils")
    except importlib.metadata.PackageNotFoundError:
        version = "unknown"

    vectors = []
    for v in build_values():
        vectors.append(
            {
                # repr() round-trips the float exactly through JSON text.
                "seconds": v,
                "with_decimals": andrew_utils.seconds_to_time(v),
                "no_decimals": andrew_utils.seconds_to_time(
                    v, include_decimals=False
                ),
            }
        )

    behaviors = []
    for v in BEHAVIOR_VALUES:
        rec: dict = {"seconds": repr(v)}
        for key, kwargs in (
            ("with_decimals", {}),
            ("no_decimals", {"include_decimals": False}),
        ):
            try:
                rec[key] = {
                    "kind": "str",
                    "value": andrew_utils.seconds_to_time(v, **kwargs),
                }
            except Exception as e:  # noqa: BLE001 — the outcome IS the data
                rec[key] = {"kind": type(e).__name__, "value": str(e)}
        behaviors.append(rec)

    out = {
        "behaviors": behaviors,
        "provenance": {
            "package": "andrew-utils",
            "version": version,
            "generated_at": datetime.now(timezone.utc).isoformat(),
            "python": platform.python_version(),
            "generator": "scripts/gen_andrew_utils_vectors.py",
        },
        "vectors": vectors,
    }
    dest = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else Path(__file__).resolve().parent.parent
        / "tests"
        / "golden"
        / "andrew_utils_vectors.json"
    )
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {len(vectors)} vectors to {dest} (andrew-utils {version})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
