"""One-op-per-subprocess bisect at bench scale (axon poisons on failure)."""
import subprocess
import sys

CASES = {
    "irfft_batch32": """
import jax, jax.numpy as jnp, numpy as np
c = jnp.asarray(np.ones((32, 2**18+1), np.complex64))
f = jax.jit(lambda c: jnp.fft.irfft(c, n=2**19, axis=1))
jax.block_until_ready(f(c)); print("OK")
""",
    "rfft_1d_519": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones(488000, np.float32))
f = jax.jit(lambda x: jnp.fft.rfft(x, n=2**19))
jax.block_until_ready(f(x)); print("OK")
""",
    "topk_496k": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 496000)).astype(np.float32))
f = jax.jit(lambda x: jax.lax.top_k(x, 996))
jax.block_until_ready(f(x)); print("OK")
""",
    "cummax_520k": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 520000)).astype(np.float32))
f = jax.jit(lambda x: (jax.lax.cummax(x, axis=1), jax.lax.cummax(x, axis=1, reverse=True)))
jax.block_until_ready(f(x)); print("OK")
""",
    "take_along_axis_big": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((32, 530000), np.float32))
idx = jnp.asarray(np.random.default_rng(0).integers(0, 530000, (32, 65*15999)).astype(np.int32))
f = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
jax.block_until_ready(f(x, idx)); print("OK")
""",
    "rfft_nonpow2_batch": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((32, 248, 3, 2000), np.float32))
f = jax.jit(lambda x: jnp.abs(jnp.fft.rfft(x, axis=-1)))
jax.block_until_ready(f(x)); print("OK")
""",
    "rfft_200_bigbatch": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((32, 248, 18, 200), np.float32))
f = jax.jit(lambda x: jnp.abs(jnp.fft.rfft(x, axis=-1)))
jax.block_until_ready(f(x)); print("OK")
""",
    "roll_big": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((32, 2**19), np.float32))
f = jax.jit(lambda x: jnp.roll(x, 1999, axis=1)[:, :489999])
jax.block_until_ready(f(x)); print("OK")
""",
}

which = sys.argv[1] if len(sys.argv) > 1 else None
if which:
    exec(CASES[which])
else:
    for name in CASES:
        r = subprocess.run(
            [sys.executable, __file__, name], capture_output=True, text=True,
            timeout=3600,
        )
        ok = "OK" in r.stdout
        tail = "" if ok else (r.stderr.strip().splitlines()[-1][:90] if r.stderr.strip() else "?")
        print(f"{name}: {'OK' if ok else 'FAIL ' + tail}", flush=True)
