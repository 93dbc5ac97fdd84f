"""Multi-host bring-up and cross-host data feeding.

The reference has no distributed runtime at all (SURVEY.md §2.3). On a
TPU pod slice, each host owns a subset of chips; this module wraps the
standard JAX multi-host bring-up:

  initialize()               -> jax.distributed.initialize (env-driven)
  global_mesh(shape)         -> Mesh over ALL devices (every host must
                                build the identical mesh)
  host_local_batch_to_global -> per-host shards -> one global jax.Array
                                (jax.make_array_from_process_local_data)

Single-process usage degrades gracefully (initialize() is a no-op when
no coordinator is configured), so the same training script runs on a
laptop CPU, one TPU chip, or an N-host slice unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gasr_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up the multi-host runtime. Returns True if distributed.

    With no arguments, reads the standard env (JAX_COORDINATOR_ADDRESS /
    cloud TPU metadata); if neither is present this is a single-process
    run and we skip initialization.
    """
    if coordinator_address is None and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ and \
            os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in (
                "", "localhost"):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def global_mesh(mesh_shape: Optional[Dict[str, int]] = None) -> Mesh:
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(mesh_shape, devices=jax.devices())


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                               specs: Dict[str, P]) -> Dict[str, jax.Array]:
    """Assemble a global data-parallel batch from per-host shards.

    Each host passes ITS slice of the batch; the result is a global
    jax.Array sharded per `specs` whose global shape is the concatenation
    over hosts along the sharded axis.
    """
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, specs[k])
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
