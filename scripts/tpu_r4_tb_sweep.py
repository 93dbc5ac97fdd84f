"""Traceback-kernel TBLK sweep at the flagship shape (L_eff=200):
the walk runs as a (batch, frame-block) grid with TBLK frames unrolled
per step; fewer steps vs bigger bodies."""
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


def bench(fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())

from gasr_tpu.decoder.beam_search import _init_beam
from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                              pack_state,
                                              traceback_pallas)

B, T, V, W, L = 256, 200, 47, 100, 200
rng = np.random.default_rng(0)
x = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
init = pack_state(_init_beam(B, W, True))
say("producing real packed_ys via the decode kernel ...")
out = jax.jit(lambda l: fused_prefix_decode(l, init, W=W, V=V))(lp)
ys = out.ys
lens = out.length
sync(ys)

ref = None
for tb in (4, 8, 16, 25):
    say(f"compiling tblk={tb} ...")
    try:
        fn = jax.jit(lambda y, ln, _tb=tb: traceback_pallas(
            y, ln, L, tblk=_tb))
        got = fn(ys, lens)
        sync(got)
    except Exception as e:   # noqa: BLE001
        say(f"tblk={tb}: FAILED {str(e)[:160]}")
        continue
    if ref is None:
        ref = got
    else:
        ok = all(bool(jnp.array_equal(a, b)) for a, b in zip(ref, got))
        say(f"  bit-equal vs tblk=4: {ok}")
    dt = bench(fn, ys, lens)
    say(f"tblk={tb}: {dt*1e3:8.2f} ms")
say("ALL DONE")
