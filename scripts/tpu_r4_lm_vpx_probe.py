"""Hardware probe: LM shallow fusion on the vocab-tiled kernel
(V=129, W=64 — conformer_s decode shape). r4 row-half tables; before
this, V >= 128 + LM silently fell back to the XLA matched path.

Checks: kernel compiles on TPU, is ARRAY-EQUAL to the matched path,
and records the timing vs no-LM and vs matched+LM.
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

from gasr_tpu.decoder import ctc_beam_search

T, B, V, W = 600, 32, 129, 64
rng = np.random.default_rng(0)
x = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
lm = jnp.asarray(rng.standard_normal((V + 1, V)).astype(np.float32))
sync(lp)

say("compiling pallas + LM (V=129, row-half tables) ...")
f_pl = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=256,
                                         merge_impl="pallas",
                                         lm_bias=lm))
got = f_pl(lp)
sync(got.tokens)
say("compiled + ran")

say("compiling matched + LM ...")
f_mt = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=256,
                                         merge_impl="matched",
                                         lm_bias=lm))
want = f_mt(lp)
sync(want.tokens)
for name in ("tokens", "lengths", "scores", "timesteps"):
    np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                  np.asarray(getattr(want, name)))
say("ARRAY-EQUAL vs matched on hardware")

f_nl = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=256,
                                         merge_impl="pallas"))
sync(f_nl(lp).tokens)
say(f"pallas+LM  : {bench(f_pl, lp)*1e3:8.2f} ms")
say(f"pallas noLM: {bench(f_nl, lp)*1e3:8.2f} ms")
say(f"matched+LM : {bench(f_mt, lp)*1e3:8.2f} ms")
say("ALL DONE")
