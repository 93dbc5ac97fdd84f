"""Stage-level TPU profile of the fused decode kernel via debug_stage.

debug_stage=N truncates the frame body after stage N (TBLK forced to 1)
— successive differences give per-stage cost. Run the full kernel at
tblk=1 too so the comparison is apples-to-apples.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def say(*a):
    print(*a, flush=True)


def sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())

from gasr_tpu.decoder.beam_search import _init_beam
from gasr_tpu.ops.pallas.fused_decode import fused_prefix_decode, pack_state

B, T, V, W = 256, 200, 47, 100
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
init = pack_state(_init_beam(B, W, True))

PACK = int(os.environ.get("PACK", "2"))
say(f"pack={PACK}")
stages = [(-3, "floor(total+f_last)"), (-2, "match"), (-1, "stay"),
          (0, "excl+ext-grid"), (1, "cand-assemble"),
          (2, "coarse-bisect"), (3, "sel+ranks"),
          (4, "inverse+rescore"), (5, "bitonic")]
prev = 0.0
for ds, name in stages:
    fn = jax.jit(lambda p, _ds=ds: fused_prefix_decode(
        p, init, W=W, V=V, pack=PACK, debug_stage=_ds))
    dt = bench(fn, lp)
    say(f"stage {ds:>3} {name:<20}: cum {dt*1e3:7.2f} ms  "
        f"delta {(dt-prev)*1e3:7.2f} ms")
    prev = dt
fn = jax.jit(lambda p: fused_prefix_decode(p, init, W=W, V=V, pack=PACK,
                                           tblk=1))
dt = bench(fn, lp)
say(f"stage  99 full(tblk=1)       : cum {dt*1e3:7.2f} ms  "
    f"delta {(dt-prev)*1e3:7.2f} ms")
fn4 = jax.jit(lambda p: fused_prefix_decode(p, init, W=W, V=V, pack=PACK,
                                            tblk=4))
say(f"full tblk=4: {bench(fn4, lp)*1e3:.2f} ms")
say("ALL DONE")
