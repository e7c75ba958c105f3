"""Suspect-op bisect at chunk-60 scale, one per subprocess."""
import subprocess
import sys

CASES = {
    "loudness60_osave": """
import numpy as np, jax, jnp_setup  # placeholder
""",
}

SNIPPETS = {
    "loudness60_osave": """
import numpy as np, jax, jax.numpy as jnp
from audio_pattern_detector_tpu.ops.loudness import build_loudness_consts, integrated_loudness_device
S, sr = 496000, 8000
c = build_loudness_consts(S, sr, overlap_save=True)
x = jnp.asarray((0.05*np.random.default_rng(0).standard_normal(S)).astype(np.float32))
out = jax.jit(integrated_loudness_device)(x, jnp.int32(S), c)
print("lufs", float(out)); print("OK")
""",
    "block_gather": """
import numpy as np, jax, jax.numpy as jnp
S = 496000
sq = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal(S)).astype(np.float32))
lo = jnp.asarray((np.arange(604) * 800).astype(np.int32))
def f(sq):
    win = lo[:, None] + jnp.arange(3200, dtype=jnp.int32)[None, :]
    g = jnp.take(sq, jnp.minimum(win, S-1), axis=0)
    return jnp.sum(g, axis=1)
out = jax.jit(f)(sq)
jax.block_until_ready(out); print("OK")
""",
    "find_peaks60_hostcorr": """
import numpy as np, jax, jax.numpy as jnp
from audio_pattern_detector_tpu.ops.peaks import find_peaks_device
L = 504000
corr = np.abs(np.random.default_rng(0).standard_normal((2, L))).astype(np.float32) * 0.1
corr[:, ::5000] = 0.5
cand = jax.jit(find_peaks_device, static_argnums=(2,3,4))(jnp.asarray(corr), jnp.int32(L-100), 0.25, 2000, 1112)
jax.block_until_ready(cand); np.asarray(cand.pos); print("OK")
""",
    "fori_1112": """
import numpy as np, jax, jax.numpy as jnp
pos = jnp.asarray(np.random.default_rng(0).integers(0, 500000, (2, 1112)).astype(np.int32))
alive = jnp.ones((2, 1112), bool)
def f(pos, alive):
    lane = jnp.arange(1112, dtype=jnp.int32)[None, :]
    def body(i, keep):
        cur = jax.lax.dynamic_index_in_dim(keep & alive, i, axis=1)
        cp = jax.lax.dynamic_index_in_dim(pos, i, axis=1)
        return keep & ~(cur & (jnp.abs(pos - cp) < 2000) & (lane != i))
    return jax.lax.fori_loop(0, 1112, body, jnp.ones_like(alive))
out = jax.jit(f)(pos, alive)
jax.block_until_ready(out); print("OK")
""",
    "while_parallel_greedy": """
import numpy as np, jax, jax.numpy as jnp
from audio_pattern_detector_tpu.ops.peaks import PeakCandidates, _greedy_distance_parallel
pos = jnp.asarray(np.sort(np.random.default_rng(0).integers(0, 500000, (2, 1112))).astype(np.int32))
cand = PeakCandidates(pos, jnp.ones((2,1112)), jnp.ones((2,1112), bool), jnp.zeros(2, bool))
out = jax.jit(lambda c: _greedy_distance_parallel(c, 2000))(cand)
jax.block_until_ready(out); print("OK")
""",
}

if len(sys.argv) > 1:
    exec(SNIPPETS[sys.argv[1]])
else:
    for name in SNIPPETS:
        r = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=3600,
                           cwd="/root/repo")
        ok = "OK" in r.stdout
        tail = "" if ok else (r.stderr.strip().splitlines()[-1][:80] if r.stderr.strip() else "?")
        print(f"{name}: {'OK' if ok else 'FAIL ' + tail}", flush=True)
