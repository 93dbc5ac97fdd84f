"""Quick TPU check for fused-decode kernel edits: compile at the
flagship shape, assert bit-exactness vs the XLA matched-merge path,
and time the kernel. Run after every kernel change, BEFORE committing.

env: SHAPE=B,T,V,W (default flagship 256,200,47,100), PACK, ITERS.
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

from gasr_tpu.decoder.beam_search import ctc_beam_search

B, T, V, W = (int(x) for x in
              os.environ.get("SHAPE", "256,200,47,100").split(","))
PACK = int(os.environ.get("PACK", "0"))
ITERS = int(os.environ.get("ITERS", "10"))
say(f"shape B={B} T={T} V={V} W={W} pack={PACK}")

rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)

say("compiling + running fused (merge_impl=pallas) ...")
got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas")
sync(got)
say("fused ran; compiling matched reference ...")
ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched")
sync(ref)
for name in ("tokens", "lengths", "scores", "timesteps", "overflow"):
    a = np.asarray(getattr(got, name))
    b = np.asarray(getattr(ref, name))
    assert np.array_equal(a, b), f"MISMATCH in {name}"
say("BIT-EXACT vs matched")

from gasr_tpu.decoder.beam_search import _init_beam
from gasr_tpu.ops.pallas.fused_decode import fused_prefix_decode, pack_state

init = pack_state(_init_beam(B, W, True))
kw = {} if PACK == 0 else {"pack": PACK}
fn = jax.jit(lambda p: fused_prefix_decode(p, init, W=W, V=V, **kw))
dt = bench(fn, lp, iters=ITERS)
say(f"kernel-only: {dt*1e3:.2f} ms")
fn_e2e = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                           merge_impl="pallas"))
dt = bench(fn_e2e, lp, iters=ITERS)
say(f"decode e2e : {dt*1e3:.2f} ms")
say("ALL DONE")
