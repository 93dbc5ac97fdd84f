"""Time traceback impls + e2e fused decode on TPU with one-element sync."""
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

B, T, V, W, L = 256, 200, 47, 100, 64
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)

from gasr_tpu.decoder.beam_search import (ctc_beam_search, _pallas_scan,
                                          _init_beam, _traceback)
from gasr_tpu.ops.pallas.fused_decode import traceback_pallas

scan_fn = jax.jit(lambda p: _pallas_scan(p, _init_beam(B, W, True), W, V, 0))
final, packed_ys = scan_fn(lp)
sync(packed_ys)


def bench(name, fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    say(f"{name}: {dt*1e3:.2f} ms/iter")
    return dt


tb_p = jax.jit(lambda ys, fl: traceback_pallas(ys, fl, L))
bench("traceback_pallas (blocked TBLK=8)", tb_p, packed_ys, final.length)

tb_s = jax.jit(lambda ys, fl: _traceback(ys, fl, L, impl="scan"))
bench("traceback scan (XLA, full incl. scatter)", tb_s, packed_ys,
      final.length)

tb_full = jax.jit(lambda ys, fl: _traceback(ys, fl, L, impl="pallas"))
bench("traceback pallas (full incl. scatter)", tb_full, packed_ys,
      final.length)

fused = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                          merge_impl="pallas", max_len=L))
bench("fused decode e2e", fused, lp)
say("OK")
