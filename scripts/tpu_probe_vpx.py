"""TPU probe: vocab-tiled (V > 128, VPX=256) fused decode kernel.

Risky constructs probed in order: 128-aligned lane-tile slices of a
256-lane array inside a kernel, then the full kernel at the conformer
shapes, exactness vs the XLA matched path, timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def say(*a):
    print(*a, flush=True)


def sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(name, fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    say(f"{name}: {dt*1e3:.2f} ms/iter")
    return dt


say("devices:", jax.devices())

say("--- micro-probe: 128-aligned lane-tile slice + split gather")


def _k(x_ref, i_ref, o_ref):
    x = x_ref[:]                      # [8, 256]
    lo = x[:, :128]
    hi = x[:, 128:256]
    idx = i_ref[:]                    # [8, 128] in [0, 256)
    a = jnp.take_along_axis(lo, idx & 127, axis=1)
    b = jnp.take_along_axis(hi, idx & 127, axis=1)
    o_ref[:] = jnp.where(idx >= 128, b, a)


x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
idx = jnp.flip(lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 2, axis=1)
out = pl.pallas_call(
    _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x, idx)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
np.testing.assert_array_equal(np.asarray(out), ref)
say("PASS lane-tile split gather")

from gasr_tpu.decoder.beam_search import ctc_beam_search
from gasr_tpu.config import PRESETS

say("--- conformer_s decode: kernel vs matched, T=40 exactness first")
rng = np.random.default_rng(0)
cfg = PRESETS["conformer_s"]
Vc, Wc, Bc, Tc = cfg.output_size, cfg.beam_width, cfg.batch_size, \
    cfg.seg_len
say(f"shape: T={Tc} B={Bc} V={Vc} W={Wc}")


def logits(T):
    lp = jnp.asarray(rng.standard_normal((T, Bc, Vc)).astype(np.float32))
    return lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)


lp_s = logits(40)
r_ref = ctc_beam_search(lp_s, beam_width=Wc, merge_impl="matched",
                        max_len=64)
r_got = ctc_beam_search(lp_s, beam_width=Wc, merge_impl="pallas",
                        max_len=64)
sync(r_got)
ok = (np.array_equal(np.asarray(r_ref.tokens), np.asarray(r_got.tokens))
      and np.array_equal(np.asarray(r_ref.scores),
                         np.asarray(r_got.scores)))
say(f"conformer_s T=40 kernel == matched: {ok}")
assert ok

say("--- full-length timing")
lp = logits(Tc)
d_ref = jax.jit(lambda p: ctc_beam_search(
    p, beam_width=Wc, merge_impl="matched", max_len=cfg.decode_max_len))
d_ker = jax.jit(lambda p: ctc_beam_search(
    p, beam_width=Wc, merge_impl="pallas", max_len=cfg.decode_max_len))
t_r = bench("conformer_s decode XLA matched", d_ref, lp, iters=3)
t_k = bench("conformer_s decode fused kernel", d_ker, lp, iters=3)
say(f"speedup: {t_r / t_k:.2f}x")
say("ALL DONE")
