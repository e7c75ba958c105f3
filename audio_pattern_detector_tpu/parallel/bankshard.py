"""Bank sharding: the clip bank distributed across devices (TP analogue).

The clip bank is the framework's "model": precomputed conjugate spectra
(G, N//2+1), self-correlation curves, and verification constants. One v5e
chip holds ~thousands of 60 s-chunk clip spectra; beyond that — or to cut
per-chunk latency — the bank's leading (G) axis shards across a mesh axis.

Correlation against a *replicated* section is embarrassingly parallel in
G: every device correlates the shared section against its clip shard and
verifies its own candidates, with zero cross-device traffic until the
(kilobyte-sized) results concatenate. Implemented with GSPMD: the bank
pytrees are device_put with a NamedSharding on their G axes and the
ordinary class-step jit partitions itself.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_pattern_detector_tpu.models.bank import (
    PatternBank,
    _class_step_jit,
    unpack_group,
)
from audio_pattern_detector_tpu.ops.correlate import CorrelationBankConsts
from audio_pattern_detector_tpu.ops.verify import MarkerVerifyConsts, NormalVerifyConsts


def _shard_leading(mesh: Mesh, axis: str, arr: jnp.ndarray) -> jnp.ndarray:
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _shard_second(mesh: Mesh, axis: str, arr: jnp.ndarray) -> jnp.ndarray:
    """Shard axis 1 (for (2, G, ...) re/im-stacked spectra)."""
    spec = P(None, axis, *([None] * (arr.ndim - 2)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _replicate(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, P()))


def shard_group_consts(
    mesh: Mesh,
    axis: str,
    corr: CorrelationBankConsts,
    verify: "NormalVerifyConsts | MarkerVerifyConsts",
) -> tuple[CorrelationBankConsts, Any]:
    """Re-place one group's constants: G-leading arrays sharded over
    ``axis``, shared structure replicated. Shapes are unchanged, so the
    ordinary class-step executable applies (GSPMD inserts the layout)."""
    corr_sharded = replace(
        corr,
        bank_rfft_conj_ri=_shard_second(mesh, axis, corr.bank_rfft_conj_ri),
        self_corr_max=_shard_leading(mesh, axis, corr.self_corr_max),
    )
    if isinstance(verify, NormalVerifyConsts):
        verify_sharded = replace(
            verify,
            corr_clip_partitions=_shard_leading(mesh, axis, verify.corr_clip_partitions),
            ds_clip=_shard_leading(mesh, axis, verify.ds_clip),
        )
    else:
        verify_sharded = replace(
            verify,
            hann_whole=_replicate(mesh, verify.hann_whole),
            freqs_whole=_replicate(mesh, verify.freqs_whole),
            band_whole=_shard_leading(mesh, axis, verify.band_whole),
            dom_freq=_shard_leading(mesh, axis, verify.dom_freq),
            lock_hz=_shard_leading(mesh, axis, verify.lock_hz),
            hann_frame=_replicate(mesh, verify.hann_frame),
            freqs_frame=_replicate(mesh, verify.freqs_frame),
            band_frame=_shard_leading(mesh, axis, verify.band_frame),
            thresholds=_shard_leading(mesh, axis, verify.thresholds),
        )
    return corr_sharded, verify_sharded


class BankShardedBank:
    """A PatternBank whose group constants live sharded across a mesh axis.

    Drop-in for PatternBank.process_chunk: same inputs, same results; the
    device programs run bank-parallel. Group sizes must be divisible by
    the axis size (pad the bank with dummy clips if needed).
    """

    def __init__(self, bank: PatternBank, mesh: Mesh, axis: str = "bank") -> None:
        if axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}")
        self._bank = bank
        self.mesh = mesh
        self.axis = axis
        n_shards = mesh.shape[axis]
        self._sharded: dict[int, tuple] = {}
        for sw, cls in bank.classes.items():
            shard_groups = []
            for g in cls["groups"]:
                if len(g.names) % n_shards != 0:
                    raise ValueError(
                        f"group of {len(g.names)} clips not divisible by "
                        f"{n_shards} bank shards"
                    )
                shard_groups.append(shard_group_consts(mesh, axis, g.corr, g.verify))
            self._sharded[sw] = tuple(shard_groups)

    def process_chunk(self, chunk, previous_chunk):
        """Synchronous chunk processing over the sharded bank."""
        bank = self._bank
        sr = bank.sample_rate
        results: dict[str, list[int]] = {}
        for sw, cls in bank.classes.items():
            if previous_chunk is not None:
                raw_section = np.concatenate(
                    (previous_chunk[int(-sw * sr):], chunk)
                )
            else:
                raw_section = chunk
            n_valid = len(raw_section)
            section = np.zeros(cls["section_len"], dtype=np.float32)
            section[:n_valid] = raw_section

            with self.mesh:
                outs = _class_step_jit(
                    jnp.asarray(section),
                    jnp.float32(n_valid),
                    cls["loud"],
                    self._sharded[sw],
                    metas=bank._metas[sw],
                    height_min=bank.height_min,
                    lean=True,
                )

            for g, out in zip(cls["groups"], outs):
                pos, sel, host_fb, needs_full = unpack_group(
                    np.asarray(out["packed"]), g.k_verify
                )
                # needs_full (lean small-tier miss) is exact via the host
                # path too — the sharded program has no full-tier rerun.
                overflow = host_fb | needs_full
                for ci, name in enumerate(g.names):
                    if overflow[ci]:
                        results[name] = bank._host_fallback(g, ci, raw_section)
                    else:
                        results[name] = [int(p) for p in pos[ci][sel[ci]]]
        return results
