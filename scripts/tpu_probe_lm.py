"""TPU probe: LM shallow fusion inside the fused decode kernel.

Checks (flagship shape): no-LM kernel still bit-exact + its timing
(the ns2-from-sorted-key simplification), LM kernel vs LM matched
bit-exact, LM kernel timing.
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

B, T, V, W = 256, 200, 47, 100
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
lm = jnp.asarray(rng.standard_normal((V + 1, V)).astype(np.float32))


def check(name, kw):
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas", **kw)
    sync(got)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched", **kw)
    sync(ref)
    for f in ("tokens", "lengths", "scores", "timesteps", "overflow"):
        a, b = np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        assert np.array_equal(a, b), f"MISMATCH {name}:{f}"
    say(f"{name}: BIT-EXACT")
    fn = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                           merge_impl="pallas", **kw))
    say(f"{name}: decode e2e {bench(fn, lp)*1e3:.2f} ms")


check("no-lm", {})
check("lm", {"lm_bias": lm})
fn_m = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                         merge_impl="matched",
                                         lm_bias=lm))
say(f"lm matched (XLA) e2e: {bench(fn_m, lp, iters=2)*1e3:.2f} ms")
say("ALL DONE")
