"""Is a one-hot MXU row lookup of a bf16-valued f32 table EXACT on TPU?

Feeds every row index through the same dot_general pattern the LM
kernel uses and compares bit patterns against the table. If this
passes for all rows/lanes, the MXU lookup hypothesis for the LM
mismatch is dead and the bug is elsewhere.
"""
import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

R, L = 128, 128     # table rows/lanes
Bt, S = 8, 128      # index block


def _kernel(idx_ref, tbl_ref, out_ref):
    b1 = (lax.broadcasted_iota(jnp.int32, (Bt, S, R), 2) ==
          jnp.expand_dims(idx_ref[...], 2)).astype(jnp.float32)
    rows = lax.dot_general(b1, tbl_ref[...], (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    # pick lane = idx too (diagonal probe) via one-hot multiply+sum
    ohv = (lax.broadcasted_iota(jnp.int32, (Bt, S, L), 2) ==
           jnp.expand_dims(idx_ref[...], 2)).astype(jnp.float32)
    out_ref[...] = jnp.sum(rows * ohv, axis=2)


@jax.jit
def lookup(idx, tbl):
    return pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bt, S), jnp.float32),
    )(idx, tbl)


rng = np.random.default_rng(0)
tbl = rng.standard_normal((R, L)).astype(np.float32)
tblq = jnp.asarray(tbl).astype(jnp.bfloat16).astype(jnp.float32) + 0.0
tq = np.asarray(tblq)

idx = jnp.asarray((np.arange(Bt * S) % R).reshape(Bt, S).astype(np.int32))
got = np.asarray(lookup(idx, tblq))
want = tq[np.asarray(idx), np.asarray(idx)]
bad = got.view(np.int32) != want.view(np.int32)
print("diag lookup mismatches:", int(bad.sum()), "of", bad.size,
      flush=True)
if bad.any():
    i = np.argwhere(bad)[0]
    r = int(np.asarray(idx)[tuple(i)])
    print(f"first: idx={r} got={got[tuple(i)]!r} want={want[tuple(i)]!r}",
          flush=True)
print("ALL DONE", flush=True)
