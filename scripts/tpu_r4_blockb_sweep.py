"""block_b sweep for the flagship fused decode kernel: the r4
tile-scaled VMEM allowance may now admit block_b > 32 (fewer batch
tiles -> fewer grid steps -> less fixed per-step cost; 8 tiles x 200
frames x ~2 us = ~3.2 ms of the 65-68 ms kernel)."""
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


def bench(fn, *args, iters=15):
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
x = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
init = pack_state(_init_beam(B, W, True))
sync(lp)

ref = None
for bb in (32, 48, 64):
    say(f"compiling block_b={bb} ...")
    try:
        fn = jax.jit(lambda l, _bb=bb: fused_prefix_decode(
            l, init, W=W, V=V, block_b=_bb))
        out = fn(lp)
        sync(out.ys)
    except Exception as e:   # noqa: BLE001
        say(f"block_b={bb}: FAILED {str(e)[:200]}")
        continue
    if ref is None:
        ref = out
    else:
        ok = bool(jnp.array_equal(ref.ys, out.ys)) and \
            bool(jnp.array_equal(ref.length, out.length))
        say(f"  bit-equal vs block_b=32: {ok}")
    dt = bench(fn, lp)
    say(f"block_b={bb}: {dt*1e3:8.2f} ms")
say("ALL DONE")
