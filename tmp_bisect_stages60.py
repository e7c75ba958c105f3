"""Stage functions at chunk=60 scale, one per subprocess."""
import subprocess
import sys

CASES = ["control10", "loudness60", "normalize60", "correlate60", "peaks60",
         "verify_normal60", "verify_marker60"]

if len(sys.argv) > 1:
    which = sys.argv[1]
    import numpy as np, jax, jax.numpy as jnp
    from audio_pattern_detector_tpu.models.bank import _class_step_jit, _BIG
    from audio_pattern_detector_tpu.ops.loudness import (
        integrated_loudness_device, loudness_normalize_device, build_loudness_consts,
    )
    from audio_pattern_detector_tpu.ops.correlate import bank_correlate
    from audio_pattern_detector_tpu.ops.peaks import find_peaks_device
    from audio_pattern_detector_tpu.ops.verify import verify_marker, verify_normal
    from __graft_entry__ import _make_bank

    if which == "control10":
        bank, _ = _make_bank(num_normal=1, num_marker=1, chunk_seconds=10)
    else:
        bank, _ = _make_bank(num_normal=1, num_marker=1, chunk_seconds=60)
    sw = sorted(bank.classes)[0]
    cls = bank.classes[sw]
    gm, gn = cls["groups"][0], cls["groups"][1]
    if gm.kind != "marker":
        gm, gn = gn, gm
    S = cls["section_len"]
    rng = np.random.default_rng(7)
    section = jnp.asarray((0.05 * rng.standard_normal(S)).astype(np.float32))
    nv = jnp.int32(S)
    loud = cls["loud"]

    if which == "control10":
        gc = tuple((g.corr, g.verify) for g in cls["groups"])
        outs = _class_step_jit(section, nv, loud, gc,
                               metas=bank._metas[sw], height_min=0.25)
        jax.block_until_ready(outs)
        [np.asarray(o["pos"]) for o in outs]
    elif which == "loudness60":
        out = jax.jit(integrated_loudness_device)(section, nv, loud)
        print("lufs", float(out))
    elif which == "normalize60":
        lufs = jax.jit(integrated_loudness_device)(section, nv, loud)
        norm = jax.jit(loudness_normalize_device)(section, lufs)
        print("norm ok", float(jnp.max(jnp.abs(norm))))
    elif which == "correlate60":
        corr, vl = jax.jit(bank_correlate)(section, nv, gm.corr)
        jax.block_until_ready(corr)
        corr2, _ = jax.jit(bank_correlate)(section, nv, gn.corr)
        jax.block_until_ready(corr2)
    elif which == "peaks60":
        corr, vl = jax.jit(bank_correlate)(section, nv, gm.corr)
        cand = jax.jit(find_peaks_device, static_argnums=(3, 4))(
            corr, vl, 0.25, gm.clip_len, gm.k_detect)
        jax.block_until_ready(cand)
        np.asarray(cand.pos)
    elif which == "verify_normal60":
        corr, vl = jax.jit(bank_correlate)(section, nv, gn.corr)
        pos = jnp.asarray(np.linspace(20000, 400000, gn.k_verify)[None, :].astype(np.int32))
        alive = jnp.ones((1, gn.k_verify), bool)
        out = jax.jit(verify_normal)(corr, pos, alive, gn.verify)
        jax.block_until_ready(out)
    elif which == "verify_marker60":
        lufs = jax.jit(integrated_loudness_device)(section, nv, loud)
        norm = jax.jit(loudness_normalize_device)(section, lufs)
        pos = jnp.asarray(np.linspace(20000, 400000, gm.k_verify)[None, :].astype(np.int32))
        alive = jnp.ones((1, gm.k_verify), bool)
        out = jax.jit(verify_marker)(norm, pos, alive, gm.verify)
        jax.block_until_ready(out)
        np.asarray(out)
    print("OK")
else:
    for name in CASES:
        r = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=3600)
        ok = "OK" in r.stdout
        tail = "" if ok else (r.stderr.strip().splitlines()[-1][:90] if r.stderr.strip() else "?")
        print(f"{name}: {'OK' if ok else 'FAIL ' + tail}", flush=True)
