"""Bench-scale class-step bisect, one configuration per subprocess."""
import subprocess
import sys

CASES = ["marker_only", "normal_only", "both", "marker_2clips", "normal_2clips"]

if len(sys.argv) > 1:
    which = sys.argv[1]
    import numpy as np, jax, jax.numpy as jnp
    from audio_pattern_detector_tpu.models.bank import _class_step_jit
    from __graft_entry__ import _make_bank

    nm = {"marker_only": (0, 32), "normal_only": (32, 0), "both": (32, 32),
          "marker_2clips": (0, 2), "normal_2clips": (2, 0)}[which]
    bank, _ = _make_bank(num_normal=nm[0], num_marker=nm[1], chunk_seconds=60)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    groups = cls["groups"]
    metas = bank._metas[sw]
    S = cls["section_len"]
    rng = np.random.default_rng(7)
    section = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
    gc = tuple((g.corr, g.verify) for g in groups)
    outs = _class_step_jit(section, jnp.int32(S), cls["loud"], gc,
                           metas=metas, height_min=0.25)
    jax.block_until_ready(outs)
    # also exercise the collect transfers
    for out in outs:
        np.asarray(out["pos"]); np.asarray(out["accept"])
    print("OK")
else:
    for name in CASES:
        r = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=3600)
        ok = "OK" in r.stdout
        tail = "" if ok else (r.stderr.strip().splitlines()[-1][:90] if r.stderr.strip() else "?")
        print(f"{name}: {'OK' if ok else 'FAIL ' + tail}", flush=True)
