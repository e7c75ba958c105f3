"""Sequence-parallel detection: one long stream sharded across the mesh.

The serial engine scans a stream as overlapping sections
(chunk + ``sliding_window`` seconds of lookback — reference:
audio_pattern_detector.py:400-412). Here every device owns one chunk-sized
time slice of the stream and receives its lookback halo from the left
neighbour over ICI (``jax.lax.ppermute``), so each device's section is
bit-identical to the section the serial loop would have built for that
chunk index — the FFT-correlation equivalent of ring attention's halo
exchange. A second mesh axis ("stream") runs independent streams in
parallel (DP).

Timestamp algebra on the host matches the serial engine exactly: device 0
is the lookback-free first chunk, every other device subtracts its
sliding-window seconds.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from numpy.typing import NDArray

from audio_pattern_detector_tpu.models.bank import PatternBank, _class_step
from audio_pattern_detector_tpu.models.detector import AudioPatternDetector
from audio_pattern_detector_tpu.utils.clip import AudioClip

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore


class ShardedDetector:
    """Offline/batch detector over a (stream, time) device mesh.

    ``detect(audio)`` takes a (B, T) float32 batch of equal-length streams,
    shards B over the optional "stream" axis and T over the "time" axis
    (T must equal time_axis_size · chunk_samples), and returns per-stream,
    per-clip timestamps identical to running the serial engine with
    ``seconds_per_chunk = chunk_seconds`` on each stream.
    """

    def __init__(
        self,
        audio_clips: list[AudioClip],
        mesh: Mesh,
        chunk_seconds: int,
        target_sample_rate: "int | None" = None,
        height_min: "float | None" = None,
    ) -> None:
        if "time" not in mesh.axis_names:
            raise ValueError("mesh must have a 'time' axis")
        self.mesh = mesh
        self.time_size = mesh.shape["time"]
        self.stream_size = mesh.shape.get("stream", 1)
        self.chunk_seconds = chunk_seconds

        self._detector = AudioPatternDetector(
            audio_clips=audio_clips,
            seconds_per_chunk=chunk_seconds,
            target_sample_rate=target_sample_rate,
            height_min=height_min,
        )
        self.sample_rate = self._detector.target_sample_rate
        self.chunk_samples = chunk_seconds * self.sample_rate
        self.bank: PatternBank = self._detector._ensure_bank()
        self._jitted: dict[int, Any] = {}

    # ── device program ──

    def _build_class_fn(self, sw: int):
        """shard_map'ed program for one sliding-window class."""
        cls = self.bank.classes[sw]
        metas = self.bank._metas[sw]
        height_min = self.bank.height_min
        halo = sw * self.sample_rate
        S_local = self.chunk_samples
        time_size = self.time_size
        has_stream = "stream" in self.mesh.axis_names
        blk_spec = P("stream" if has_stream else None, "time")

        loud = cls["loud"]
        group_consts = tuple((g.corr, g.verify) for g in cls["groups"])

        def local_fn(blk, loud_c, gconsts):
            # blk: (B_local, 1, S_local) — this device's time slice.
            local = blk[:, 0, :]
            tail = local[:, -halo:]
            # Left-neighbour halo rides ICI; device 0 receives zeros.
            perm = [(i, i + 1) for i in range(time_size - 1)]
            recv = jax.lax.ppermute(tail, "time", perm)
            t_idx = jax.lax.axis_index("time")

            sec_with_halo = jnp.concatenate([recv, local], axis=1)
            sec_first = jnp.concatenate(
                [local, jnp.zeros_like(local[:, :halo])], axis=1
            )
            section = jnp.where(t_idx == 0, sec_first, sec_with_halo)
            n_valid = jnp.where(
                t_idx == 0, jnp.int32(S_local), jnp.int32(S_local + halo)
            )

            step = lambda s: _class_step(
                s, n_valid, loud_c, gconsts, metas=metas, height_min=height_min
            )
            outs = jax.vmap(step)(section)
            # Re-insert the time axis for the out_spec.
            return jax.tree_util.tree_map(lambda a: a[:, None], outs)

        mapped = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(*blk_spec, None), P(), P()),
            out_specs=P(*blk_spec),
            check_vma=False,
        )
        return jax.jit(lambda blk: mapped(blk, loud, group_consts))

    # ── host API ──

    def detect(self, audio: NDArray[np.float32]) -> dict[str, list[list[float]]]:
        """Scan a (B, T) batch of streams; returns name -> per-stream
        sorted timestamp lists (serial-engine-identical algebra)."""
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        B, T = audio.shape
        expect_t = self.time_size * self.chunk_samples
        if T != expect_t:
            raise ValueError(
                f"stream length {T} must be time_axis({self.time_size}) x "
                f"chunk_samples({self.chunk_samples}) = {expect_t}; pad with zeros"
            )
        if B % self.stream_size != 0:
            raise ValueError(
                f"batch {B} must be divisible by stream axis {self.stream_size}"
            )

        blocks = audio.reshape(B, self.time_size, self.chunk_samples)
        has_stream = "stream" in self.mesh.axis_names
        sharding = NamedSharding(
            self.mesh, P("stream" if has_stream else None, "time", None)
        )
        blocks_dev = jax.device_put(blocks, sharding)

        results: dict[str, list[list[float]]] = {}
        sr = self.sample_rate
        for sw, cls in self.bank.classes.items():
            if sw not in self._jitted:
                self._jitted[sw] = self._build_class_fn(sw)
            outs = self._jitted[sw](blocks_dev)
            for g, out in zip(cls["groups"], outs):
                pos = np.asarray(out["pos"])  # (B, Dt, G, K)
                sel = np.asarray(out["alive"]) & np.asarray(out["accept"])
                for ci, name in enumerate(g.names):
                    clip_seconds = g.clip_len / sr
                    per_stream: list[list[float]] = []
                    for b in range(B):
                        times: list[float] = []
                        for d in range(self.time_size):
                            subtract = 0 if d == 0 else sw
                            for k in np.nonzero(sel[b, d, ci])[0]:
                                t = (
                                    int(pos[b, d, ci, k]) / sr
                                    - subtract
                                    + d * self.chunk_seconds
                                    - clip_seconds
                                )
                                times.append(t if t >= 0 else 0)
                        per_stream.append(sorted(times))
                    results[name] = per_stream
        return results


def detections_from_sharded(
    results: dict[str, list[list[float]]], stream_index: int = 0
) -> dict[str, list[float]]:
    """Flatten a ShardedDetector result to the serial engine's dict shape."""
    return {name: per_stream[stream_index] for name, per_stream in results.items()}
