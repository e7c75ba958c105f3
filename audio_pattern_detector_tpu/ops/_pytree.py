"""Helper for registering consts dataclasses as JAX pytrees.

Device constants are passed to jitted programs as pytree leaves (so they
live in HBM once, instead of being baked into every compiled executable),
while shape-defining scalars are static metadata that participate in the
jit cache key.
"""

from __future__ import annotations

import dataclasses
from typing import Any


def static_field(**kwargs: Any) -> Any:
    """Dataclass field treated as static (aux) data by jax pytree flattening."""
    return dataclasses.field(metadata=dict(static=True), **kwargs)


def host_const(x: Any, dtype: Any) -> Any:
    """Upload a host array as a device constant, converting dtype on HOST.

    ``jnp.asarray(x, dtype=...)`` with a mismatched host dtype stages a
    ``convert_element_type`` program on the device; the shared-tunnel TPU
    backend rejects some of those conversions (observed: int64→int32 fails
    UNIMPLEMENTED deterministically while f32 programs run fine). Doing the
    cast in numpy first uploads the final buffer directly.
    """
    import jax.numpy as jnp
    import numpy as np

    return jnp.asarray(np.asarray(x, dtype=dtype))
