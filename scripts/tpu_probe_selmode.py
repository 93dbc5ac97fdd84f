"""Does the in-kernel lax.cond(go_exact, ...) pay for both branches?

Times sel_mode auto vs slack vs exact at the flagship shape. If auto
~= exact >> slack, Mosaic executes (or at least schedules/pays for)
both branches every frame and the cond should be restructured; if
auto ~= slack, the branch is real and cheap (go_exact fires only on
the first ~2 frames).
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

for mode in ("auto", "slack", "exact"):
    fn = jax.jit(lambda p, _m=mode: fused_prefix_decode(
        p, init, W=W, V=V, sel_mode=_m))
    dt = bench(fn, lp)
    say(f"sel_mode={mode:<6}: {dt*1e3:7.2f} ms")
say("ALL DONE")
