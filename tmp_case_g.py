import numpy as np, jax, jax.numpy as jnp, sys
from audio_pattern_detector_tpu.models.bank import _class_step_jit
from __graft_entry__ import _make_bank
nn, nm = int(sys.argv[1]), int(sys.argv[2])
bank, _ = _make_bank(num_normal=nn, num_marker=nm, chunk_seconds=10)
sw = sorted(bank.classes)[0]
cls = bank.classes[sw]
S = cls["section_len"]
rng = np.random.default_rng(7)
section = jnp.asarray((0.05*rng.standard_normal(S)).astype(np.float32))
gc = tuple((g.corr, g.verify) for g in cls["groups"])
outs = _class_step_jit(section, jnp.int32(S), cls["loud"], gc, metas=bank._metas[sw], height_min=0.25)
jax.block_until_ready(outs)
[np.asarray(o["packed"]) for o in outs]
print("OK")
