"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: "dict[str, int] | None" = None,
    devices: "list | None" = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    ``axis_sizes`` maps axis name -> size, e.g. {"stream": 2, "time": 4}.
    Defaults to a 1-D "time" mesh over all devices.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"time": len(devices)}
    shape = tuple(axis_sizes.values())
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(
            f"mesh needs {total} devices, only {len(devices)} available"
        )
    try:
        # Topology-aware ordering: the per-chunk ppermute halo exchange
        # rides the "time" axis every slab, so mesh neighbours should be
        # ICI-adjacent on real multi-chip slices, not enumeration-order.
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_device_mesh(
            shape, devices=devices[:total], allow_split_physical_axes=True
        )
    except Exception:
        # Virtual/CPU device sets (tests, dryrun) have no topology to
        # respect; plain enumeration order is correct there.
        grid = np.asarray(devices[:total]).reshape(shape)
    return Mesh(grid, tuple(axis_sizes.keys()))
