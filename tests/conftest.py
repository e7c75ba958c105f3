"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's backend-independent test strategy (reference:
tests use synthetic BytesIO streams; SURVEY.md §4): all engine/parity tests
run on CPU so they execute anywhere; multi-device sharding tests use the
virtual host-device mesh. Set APD_TPU_TESTS=1 to run on real TPU instead.
"""

import os
import sys

if os.environ.get("APD_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment may force an accelerator platform (e.g. via
    # sitecustomize); jax.config wins over the env var, so set it here
    # before any backend is initialised.
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SAMPLE_AUDIOS = os.path.join(REPO_ROOT, "sample_audios")
