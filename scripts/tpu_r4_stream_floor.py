"""Decompose streaming overhead: time 10 chunked _pallas_scan decode
calls WITHOUT traceback/overlay (the launch+dispatch floor), vs the
full streaming_step path (81.2 ms), vs batch decode (63.7 ms)."""
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


say("devices:", jax.devices())

import functools
from gasr_tpu.decoder.beam_search import (_init_beam, _pallas_scan,
                                          streaming_init, streaming_step)

T, B, V, W, Tc = 200, 256, 47, 100, 20
rng = np.random.default_rng(0)
x = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
sync(lp)


@functools.partial(jax.jit, static_argnames=())
def chunk_decode(chunk, beam):
    final, ys = _pallas_scan(chunk, beam, W, V, 0)
    return final, ys


init = _init_beam(B, W, True)

say("compiling chunk decode ...")
f0, _ = chunk_decode(lp[:Tc], init)
sync(f0)


def run_chunks_only():
    beam = init
    ys = None
    for c in range(T // Tc):
        beam, ys = chunk_decode(lp[c * Tc:(c + 1) * Tc], beam)
    return beam, ys


sync(run_chunks_only())
t0 = time.perf_counter()
for _ in range(10):
    out = run_chunks_only()
sync(out)
dt = (time.perf_counter() - t0) / 10
say(f"chunks-only (no traceback/overlay): {dt*1e3:.1f} ms")

st0 = streaming_init(B, W, max_len=256)


def run_full():
    st = st0
    res = None
    for c in range(T // Tc):
        st, res = streaming_step(st, lp[c * Tc:(c + 1) * Tc])
    return res


say("compiling full streaming ...")
sync(run_full())
t0 = time.perf_counter()
for _ in range(10):
    out = run_full()
sync(out)
dt = (time.perf_counter() - t0) / 10
say(f"full streaming: {dt*1e3:.1f} ms")
say("ALL DONE")
