"""Probe the flash MHSA kernel on real TPU: compile small, then
conformer_l shape, check vs XLA path, time, then full-model impact.
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

from gasr_tpu.ops.attention import mhsa_rel, mhsa_rel_init

# ---- step 1: small-shape compile (cheap wedge check) ----
for (T, B, D, H) in [(16, 2, 32, 4), (300, 64, 512, 8), (150, 32, 144, 4)]:
    p = mhsa_rel_init(jax.random.PRNGKey(0), D, H)
    p["u"] = jax.random.normal(jax.random.PRNGKey(5), p["u"].shape) * 0.1
    p["v"] = jax.random.normal(jax.random.PRNGKey(6), p["v"].shape) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    say(f"--- T={T} B={B} D={D} H={H}: compiling pallas ...")
    fp = jax.jit(lambda pp, xx: mhsa_rel(pp, xx, H, impl="pallas",
                                         compute_dtype=jnp.bfloat16))
    got = fp(p, x)
    sync(got)
    fx = jax.jit(lambda pp, xx: mhsa_rel(pp, xx, H, impl="xla",
                                         compute_dtype=jnp.bfloat16))
    ref = fx(p, x)
    sync(ref)
    d = float(jnp.abs(ref - got).max())
    s = float(jnp.abs(ref).max())
    say(f"    maxdiff={d:.5f} scale={s:.3f}")
    tp = bench(fp, p, x)
    tx = bench(fx, p, x)
    say(f"    pallas {tp*1e3:8.3f} ms   xla {tx*1e3:8.3f} ms")

# ---- step 2: full conformer_l forward with auto dispatch ----
import dataclasses
from gasr_tpu.config import PRESETS
from gasr_tpu.models import model_apply, model_init

cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
params = model_init(cfg, jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1),
                       (cfg.batch_size, cfg.seg_len, cfg.feat_size))
sync(x)
say("compiling full conformer_l bf16 (flash auto) ...")
fn = jax.jit(lambda p, xx: model_apply(cfg, p, xx,
                                       compute_dtype=jnp.bfloat16))
dt = bench(fn, params, x, iters=5)
say(f"FULL conformer_l bf16+flash: {dt*1e3:8.2f} ms")
say("ALL DONE")
