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
