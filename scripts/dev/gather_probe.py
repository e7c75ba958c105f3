"""Dev probe: compare gather lowerings on the tunnel TPU (chained timing).

Shapes mirror verify_normal's candidate-window extraction:
(G=32, K=66) windows of lc=15999 from a (G, ~520k) correlation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("APD_PROFILE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

G, K, LC = 32, 66, 15999
L = 520000

rng = np.random.default_rng(0)
corr = jnp.asarray(rng.standard_normal((G, L)).astype(np.float32))
starts = jnp.asarray(
    rng.integers(0, L - LC, size=(G, K)).astype(np.float32)
)  # f32 upload, cast in-graph


def delta(tok):
    return jnp.where(jnp.isnan(tok), 1.0, 0.0)


def timeit(step, iters=5, repeats=2):
    tok = jax.block_until_ready(step(jnp.float32(0.0)))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        t = tok
        for _ in range(iters):
            t = step(t)
        jax.block_until_ready(t)
        samples.append((time.perf_counter() - t0) / iters)
    return float(np.median(samples))


@jax.jit
def via_take_along_axis(tok):
    s = starts.astype(jnp.int32)
    gidx = (s[:, :, None] + jnp.arange(LC, dtype=jnp.int32)).reshape(G, K * LC)
    out = jnp.take_along_axis(corr + delta(tok), gidx, axis=1).reshape(G, K, LC)
    return jnp.sum(out)


@jax.jit
def via_flat_1d(tok):
    s = starts.astype(jnp.int32)
    row_off = (jnp.arange(G, dtype=jnp.int32) * L)[:, None, None]
    gidx = s[:, :, None] + jnp.arange(LC, dtype=jnp.int32) + row_off
    out = (corr + delta(tok)).reshape(-1)[gidx]
    return jnp.sum(out)


@jax.jit
def via_dynamic_slice(tok):
    s = starts.astype(jnp.int32)
    c = corr + delta(tok)

    def per_row(row, st):
        return jax.vmap(
            lambda x: jax.lax.dynamic_slice(row, (x,), (LC,))
        )(st)

    out = jax.vmap(per_row)(c, s)
    return jnp.sum(out)


for name, fn in [
    ("take_along_axis", via_take_along_axis),
    ("flat_1d_gather", via_flat_1d),
    ("dynamic_slice_vmap", via_dynamic_slice),
]:
    t = timeit(fn)
    print(f"{name:20s} {t*1e3:8.1f} ms", flush=True)
