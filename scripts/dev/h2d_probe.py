"""Host->device transfer cost probe for the tunnel runtime.

Times jax.device_put + a trivial consuming program for payloads from 0.5 MB
to 32 MB, to separate per-launch fixed cost from bandwidth. If transfer is
bandwidth-bound at tunnel-link speeds, shrinking the audio payload (e.g.
uploading 16-bit PCM packed into f32 bit patterns and unpacking in-graph)
is the next streaming-throughput lever.

Run standalone in a healthy window:  python scripts/dev/h2d_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    dev = jax.devices()[0]
    print(f"platform={dev.platform}", file=sys.stderr)

    consume = jax.jit(lambda a: jnp.sum(a))
    sizes_mb = [0.5, 1.9, 4, 8, 16, 32]
    out = {}
    for mb in sizes_mb:
        n = int(mb * 1024 * 1024 / 4)
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        # Warm the consuming program at this shape.
        jax.block_until_ready(consume(jax.device_put(x)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            xb = jax.device_put(x)
            jax.block_until_ready(xb)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        out[f"h2d_{mb}MB_s"] = t
        print(f"h2d {mb:5.1f} MB: {t * 1e3:8.2f} ms  ({mb / t:7.1f} MB/s)",
              file=sys.stderr)

    # d2h for comparison (small + medium).
    for mb in (0.5, 8):
        n = int(mb * 1024 * 1024 / 4)
        xb = jax.block_until_ready(
            jax.device_put(np.zeros(n, np.float32))
        )
        yb = jax.block_until_ready(jax.jit(lambda a: a + 1.0)(xb))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(yb)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        out[f"d2h_{mb}MB_s"] = t
        print(f"d2h {mb:5.1f} MB: {t * 1e3:8.2f} ms  ({mb / t:7.1f} MB/s)",
              file=sys.stderr)

    # Can int16 survive the boundary packed as f32 bit patterns?
    pcm = (np.random.default_rng(1).integers(-32768, 32767, 4096)).astype(
        np.int16
    )
    packed = pcm.view(np.float32)  # 2 int16 per f32 lane — may hold NaNs
    try:
        pb = jax.device_put(packed)
        rt = np.asarray(jax.jit(lambda a: a)(pb)).view(np.int16)
        out["int16_bitpack_roundtrip_ok"] = bool(np.array_equal(rt, pcm))
    except Exception as e:  # noqa: BLE001
        out["int16_bitpack_roundtrip_ok"] = False
        out["int16_bitpack_error"] = f"{type(e).__name__}: {e}"
    # In-graph unpack: f32 bits -> two int16 lanes -> float samples.
    try:
        def unpack(a):
            u = jax.lax.bitcast_convert_type(a, jnp.uint32)
            lo = (u & 0xFFFF).astype(jnp.uint16)
            hi = (u >> 16).astype(jnp.uint16)
            lo16 = lo.astype(jnp.int16).astype(jnp.float32)
            hi16 = hi.astype(jnp.int16).astype(jnp.float32)
            return jnp.stack([lo16, hi16], axis=1).reshape(-1)

        got = np.asarray(jax.jit(unpack)(jax.device_put(packed)))
        want = pcm.astype(np.float32)
        out["int16_unpack_on_device_ok"] = bool(np.array_equal(got, want))
    except Exception as e:  # noqa: BLE001
        out["int16_unpack_on_device_ok"] = False
        out["int16_unpack_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
