"""Sweep fused-decode kernel knobs on TPU: COARSE_BITS x block_b.

COARSE_BITS was swept at pack=1 in r1 (16->142, 20->139, 24->134,
28->136 ms); pack=2 halves the per-pass cost so the optimum may have
moved. COARSE_BITS is a module constant read at trace time, so each
setting clears the jit cache before re-timing.
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
import gasr_tpu.ops.pallas.fused_decode as fd

B, T, V, W = 256, 200, 47, 100
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
init = fd.pack_state(_init_beam(B, W, True))
ref = None

for cb in (16, 20, 24, 28):
    fd.COARSE_BITS = cb
    fd.fused_prefix_decode.clear_cache()
    for bb in (8, 16, 24):
        out = fd.fused_prefix_decode(lp, init, W=W, V=V, block_b=bb)
        if ref is None:
            ref = np.asarray(out.ys)
        else:
            assert np.array_equal(np.asarray(out.ys), ref), \
                f"MISMATCH cb={cb} bb={bb}"
        dt = bench(lambda p: fd.fused_prefix_decode(
            p, init, W=W, V=V, block_b=bb), lp)
        say(f"COARSE_BITS={cb} block_b={bb}: {dt*1e3:7.2f} ms")
say("ALL DONE")
