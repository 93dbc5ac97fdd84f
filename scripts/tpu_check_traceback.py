"""Validate the blocked Pallas traceback on the real TPU.

1. Bit-exactness: fused decode (pallas merge + pallas traceback) vs
   matched-merge XLA oracle at flagship shape.
2. Timing: end-to-end decode, and traceback_pallas in isolation.

Flushed prints so a backend abort leaves a trail.
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
    # D2H fetch — block_until_ready does not synchronize under the tunnel
    return np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]


say("devices:", jax.devices())

B, T, V, W, L = 256, 200, 47, 100, 64
rng = np.random.default_rng(0)
x = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(x)
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)

from gasr_tpu.decoder.beam_search import ctc_beam_search

say("compiling matched (oracle)...")
t0 = time.perf_counter()
ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched", max_len=L)
sync(ref.tokens)
say(f"  matched done in {time.perf_counter()-t0:.1f}s")

say("compiling fused (pallas merge + blocked traceback)...")
t0 = time.perf_counter()
got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas", max_len=L)
sync(got.tokens)
say(f"  fused done in {time.perf_counter()-t0:.1f}s")

for f in ("tokens", "lengths", "timesteps", "overflow"):
    np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                  np.asarray(getattr(ref, f)))
np.testing.assert_allclose(np.asarray(got.scores),
                           np.asarray(ref.scores), rtol=0, atol=0)
say("BIT-EXACT vs matched at flagship shape")

# ---- timing: end-to-end fused decode
fused = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                          merge_impl="pallas", max_len=L))
sync(fused(lp).tokens)
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    r = fused(lp)
sync(r.tokens)
dt = (time.perf_counter() - t0) / iters
say(f"fused decode e2e: {dt*1e3:.1f} ms/iter")

# ---- timing: traceback alone (blocked kernel)
from gasr_tpu.decoder.beam_search import _pallas_scan, _init_beam
from gasr_tpu.ops.pallas.fused_decode import traceback_pallas

scan_fn = jax.jit(lambda p: _pallas_scan(p, _init_beam(B, W, True), W, V, 0))
final, packed_ys = scan_fn(lp)
packed_ys = jax.block_until_ready(packed_ys)
sync(packed_ys)

tb = jax.jit(lambda ys, fl: traceback_pallas(ys, fl, L))
sync(tb(packed_ys, final.length)[0])
t0 = time.perf_counter()
for _ in range(iters):
    out = tb(packed_ys, final.length)
sync(out[0])
dt = (time.perf_counter() - t0) / iters
say(f"traceback_pallas alone: {dt*1e3:.2f} ms/iter")

# ---- max_len sweep: every shape must COMPILE on hardware (the r1
# official bench died on a traceback VMEM OOM at max_len=256; the
# dispatcher now sizes BBLK from a static budget and falls back to the
# XLA scan walk past it — max_len=4096 exercises the fallback)
from gasr_tpu.decoder.beam_search import _traceback
from gasr_tpu.ops.pallas.fused_decode import traceback_vmem_blk

for Lx in (64, 256, 1024, 4096):
    t0 = time.perf_counter()
    tok, ts, sp = _traceback(packed_ys, final.length, Lx, impl="pallas")
    sync(tok)
    say(f"max_len={Lx}: BBLK={traceback_vmem_blk(Lx)} compiled+ran "
        f"in {time.perf_counter()-t0:.1f}s")
say("OK")
