"""Small debug utilities.

print_array_info mirrors the reference's printMatrixInfo debug printer
(cuMatrix.cpp:8-16: dims + full contents) with TPU-relevant extras:
dtype, sharding, device placement, and a truncated value preview instead
of dumping everything.
"""

from __future__ import annotations

import numpy as np
import jax


def print_array_info(x, name: str = "array", max_values: int = 8) -> None:
    """Shape/dtype/sharding/summary of an array (host-syncs!)."""
    host = np.asarray(jax.device_get(x))
    sharding = getattr(x, "sharding", None)
    flat = host.ravel()
    head = np.array2string(flat[:max_values], precision=4,
                           separator=", ")
    stats = ""
    if np.issubdtype(host.dtype, np.floating) and flat.size:
        stats = (f" min={flat.min():.4g} max={flat.max():.4g}"
                 f" mean={flat.mean():.4g}"
                 f" finite={np.isfinite(flat).all()}")
    print(f"[{name}] shape={host.shape} dtype={host.dtype}"
          f" sharding={sharding}{stats} head={head}")


def tree_size_bytes(tree) -> int:
    """Total bytes of a params pytree."""
    return sum(getattr(leaf, "nbytes", 0)
               for leaf in jax.tree_util.tree_leaves(tree))
