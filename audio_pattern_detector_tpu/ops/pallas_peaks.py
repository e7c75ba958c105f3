"""Single-pass Pallas candidate scan for the lean detection tier.

SHIPPING STATUS (measured on v5e via the tunnel runtime; defaults set
in models/bank.py::__init__):

* **BATCH/SCAN dispatch on TPU: DEFAULT ON.** Under the scan schedule
  launches are amortised and the batch loop's host time is additive,
  so the kernel's mask-stage win surfaces end-to-end: +5.2% on
  scan-batch B=16 (round-4 order-alternating A/B,
  scripts/dev/pallas_scanbatch_ab.py, results asserted identical —
  the probe audio embeds real clip hits so the verify/greedy-survivor
  path is covered, not just noise rows).
* **Streaming (single-chunk launches): OFF.** The per-step win does
  not surface e2e (round-3 A/B ~-1.5%): the (G, L) → (G, 8, W) layout
  copy Mosaic's tiling requires, plus losing XLA's fusion of the mask
  chain into the irfft consumer, eat the pass-merging win at depth-1
  launch cadence. 46.8 ms vs 25.3 ms in the isolated fused step.

``APD_PALLAS=1`` forces the kernel on everywhere (including streaming
and vmap batches), ``=0`` forces it off everywhere. Payload parity with
the XLA lean path is bit-exact in all modes (tests/test_pallas_peaks.py
differential suite, including a hit-bearing batched-dispatch identity
test that forces the TPU default on under interpret mode). The kernel
additionally guards rounding-edge near-ties in-kernel: candidates
within 8 ulp of a neighbouring plateau value flag the row to the exact
full-tier path (same escape the XLA formulation takes).

The lean tier's pre-top-k work — valid-length masking, plateau-midpoint
local-maxima mask, height filter, per-row candidate count, ≥4-plateau
flag, observed correlation max, and the hierarchical top-k's stage-1
block maxima — is 4-5 XLA passes over each (G, L≈500k) correlation row.
This kernel computes all of it in ONE HBM read per row, returning only
tiny per-row/per-block tensors (no (G, L) writes at all).

Threshold circularity is broken with a host-static LOWER BOUND: the true
height threshold is ``height_min · max(self_corr_max, observed_max)``,
but ``observed_max`` is itself an output of this pass. The kernel counts
candidates against ``thr_min = height_min · self_corr_max ≤ thr``, which
over-counts — flags become conservative (a row may be sent to the exact
full-tier/host path when the true count was smaller) but never unsound.
Block maxima are of UNthresholded local-maxima values, so stage-2 block
ranking is threshold-independent: an above-threshold candidate always
outranks any below-threshold block (v ≥ thr > u), preserving the
hierarchical top-k exactness argument; the true-threshold mask is
re-derived exactly on the gathered block expansion (tiny).

Layout: Mosaic requires the last two block dims be multiples of (8, 128),
so each correlation row is viewed as ``(SUB=8, W=65536)`` sub-rows in
row-major order (flat col = sub·W + c). Flat ±shifts are per-sub-row
``pltpu.roll``s with the first/last columns carry-corrected from the
neighbouring sub-row; the global wraparound lands in the right-padded
-inf region (everything at/after ``valid_len`` is forced to -inf
in-register), reproducing the -inf edge semantics of the XLA formulation
(ops/peaks.py::_shift) exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_pattern_detector_tpu.ops.peaks import plateau_run_mask

BLOCK = 512
SUB = 8
W = 65536  # columns per sub-row; W % BLOCK == 0
NB = SUB * (W // BLOCK)  # 1024 stage-1 blocks
LPAD = SUB * W  # 524288 — covers every flagship full_len (< 517k)


def _flat_roll(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Circular shift of the row-major flattened (SUB, W) view by ``s``.

    s > 0: element (r, c) receives flat[r·W + c - s] (right shift);
    s < 0: leftward. |s| < W. Carry columns cross sub-row boundaries.
    """
    from jax.experimental.pallas import tpu as pltpu

    if s == 0:
        return x
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)
    if s > 0:
        y = pltpu.roll(x, s, axis=1)
        prev = pltpu.roll(x, 1, axis=0)  # sub-row r-1 (global wrap ok)
        carry = pltpu.roll(prev, s, axis=1)
        return jnp.where(col < s, carry, y)
    y = pltpu.roll(x, s % W, axis=1)
    nxt = pltpu.roll(x, SUB - 1, axis=0)  # sub-row r+1
    carry = pltpu.roll(nxt, s % W, axis=1)
    return jnp.where(col >= W + s, carry, y)


def _scan_kernel(thr_ref, vl_ref, x_ref, bmax_ref, stats_ref):
    # thr_ref/vl_ref are scalar-prefetch SMEM arrays: (G,) and (1,).
    x = x_ref[0]  # (SUB, W) |correlation|, junk past valid_len
    vl = vl_ref[0]
    thr = thr_ref[pl.program_id(0)]
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)
    flat = sub * W + col  # global column index
    x = jnp.where(flat.astype(jnp.float32) < vl, x, -jnp.inf)

    xm2, xm1 = _flat_roll(x, 2), _flat_roll(x, 1)
    xp1, xp2, xp3 = _flat_roll(x, -1), _flat_roll(x, -2), _flat_roll(x, -3)

    fin_p1 = xp1 != -jnp.inf
    fin_p2 = xp2 != -jnp.inf
    runs = plateau_run_mask(
        x, xm2, xm1, xp1, xp2, fin_p1, fin_p2, left_ok=flat > 1
    )
    interior = (flat > 0) & (flat < LPAD - 1)
    finite = x != -jnp.inf
    cand = runs & interior & finite

    # Near-collapse guard: the consumer re-derives this mask in QUOTIENT
    # space (x / denom, models/bank.py::_lean_group_packed_pallas) while
    # the block seeds below are raw-space. f32 division can collapse a
    # strict raw inequality between mask-comparison partners (distance
    # ≤ 2) into quotient equality, which shifts plateau midpoints, grows
    # plateaus past the len-3 handling, and breaks the block-seed
    # invariant the greedy relies on. Collapse needs the pair within
    # ~2 ulp relative; flag the row whenever any candidate-height sample
    # has a strictly-unequal comparison partner inside a conservative
    # 8-ulp band so the consumer can route it to the exact rerun. Exact
    # raw equality is preserved by division and stays unflagged.
    tol = jnp.float32(8.0 * 1.1920928955078125e-07) * x  # x ≥ thr > 0 below
    near = (x >= thr) & finite
    pair_near = jnp.zeros_like(near)
    for n in (xm2, xm1, xp1, xp2):
        pair_near |= (n != x) & (n != -jnp.inf) & (jnp.abs(x - n) <= tol)
    near &= pair_near

    scored = jnp.where(cand, x, -jnp.inf)  # in-register only
    bmax_ref[0] = jnp.max(scored.reshape(SUB, W // BLOCK, BLOCK), axis=2)

    quad = (x == xp1) & (xp1 == xp2) & (xp2 == xp3) & (x >= thr) & finite
    count = jnp.sum((cand & (x >= thr)).astype(jnp.float32))
    plateau = jnp.max(quad.astype(jnp.float32))
    omax = jnp.max(jnp.where(finite, x, 0.0))
    near_any = jnp.max(near.astype(jnp.float32))
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    first = (sub8 == 0).astype(jnp.float32)
    stats_ref[0] = first * (
        jnp.where(col8 == 0, count, 0.0)
        + jnp.where(col8 == 1, plateau, 0.0)
        + jnp.where(col8 == 2, omax, 0.0)
        + jnp.where(col8 == 3, near_any, 0.0)
    )


def candidate_scan(
    corr: jnp.ndarray,  # (G, L) |correlation|, unnormalised
    thr_min: jnp.ndarray,  # (G,) f32 — height_min * self_corr_max
    valid_len: jnp.ndarray,  # scalar int32
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused pass: (block_max (G, NB), count, plateau, observed_max,
    near_collapse).

    count/plateau are against the conservative ``thr_min`` lower bound
    (see module docstring); block_max is of unthresholded local-maxima
    values with -inf for empty blocks. ``near_collapse`` (G,) bool flags
    rows holding a candidate-height sample with a strictly-unequal mask
    comparison partner within 8 ulp relative — the only rows where f32
    division can make the quotient-space mask the consumer re-derives
    disagree with these raw-space block seeds (see _scan_kernel comment);
    consumers must route flagged rows to an exact path.
    """
    g, l = corr.shape
    assert l <= LPAD, (l, LPAD)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.pad(corr, ((0, 0), (0, LPAD - l))).reshape(g, SUB, W)
    vl = jnp.asarray(valid_len).astype(jnp.float32).reshape(1)
    thr = thr_min.astype(jnp.float32).reshape(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # thr (G,), vl (1,) land in SMEM
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, SUB, W), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, W // BLOCK), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, SUB, 128), lambda i, *_: (i, 0, 0)),
        ],
    )
    kwargs = {}
    if not interpret:
        # The (8, W) block + shift temps sit ~3% over the default 16 MB
        # scoped-vmem budget; v5e VMEM accommodates the raised cap.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        )
    bmax, stats = pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, SUB, W // BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((g, SUB, 128), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(thr, vl, x)

    bmax = bmax.reshape(g, NB)
    count = stats[:, 0, 0]
    plateau = stats[:, 0, 1] > 0.0
    omax = stats[:, 0, 2]
    near = stats[:, 0, 3] > 0.0
    return bmax, count, plateau, omax, near
