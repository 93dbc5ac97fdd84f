"""Device mesh construction.

The reference has no distribution whatsoever (single process, single GPU,
default stream — SURVEY.md §2.3). Here the mesh is the foundation of every
parallelism axis:

  - 'data'  : utterance-batch data parallelism (DP) across chips/hosts
  - 'model' : tensor parallelism (TP) for weights that exceed one chip
              (the 2048-hidden configs), GSPMD-sharded
  - (a 'seq' axis is reserved for sequence parallelism in the Conformer
    long-context config)

Collectives ride ICI within a slice; XLA inserts them from NamedSharding
annotations — no hand-written NCCL-equivalents.

Scope decisions (SURVEY.md §2.3): pipeline parallelism is intentionally
out of scope at these model sizes (the largest config, Conformer-L at
~100M params, fits comfortably per-chip; TP exists for activation-bound
cases). Expert parallelism is out of scope (no MoE in the capability
surface). Sequence parallelism is covered operationally by streaming
chunked decode (unbounded T with carried state) rather than ring
attention, which only becomes relevant for very-long-context Conformer
variants.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from {axis: size}. Empty/None -> all devices on 'data'.

    Sizes must multiply to <= len(devices); -1 for one axis means
    "fill with remaining devices".
    """
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    names = list(mesh_shape.keys())
    sizes = list(mesh_shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, axis_names=tuple(names))


def default_mesh_shape(n_devices: int) -> Dict[str, int]:
    """Reasonable (data, model) factorization for n devices."""
    if n_devices == 1:
        return {"data": 1, "model": 1}
    model = 1
    n = n_devices
    # give model parallelism up to 4-way when divisible, rest to data
    for m in (4, 2):
        if n % m == 0:
            model = m
            break
    return {"data": n_devices // model, "model": model}
