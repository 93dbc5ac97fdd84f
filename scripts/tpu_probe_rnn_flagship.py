"""Flagship-forward probe: XLA scan RNN vs VMEM-resident Pallas RNN.

At H=2048 the scan re-streams the 16 MB f32 W_hh from HBM every
timestep (~3.9 ms of pure weight traffic at T=200); the Pallas kernel
holds W_hh in VMEM (bf16) for the whole sequence. Reports timing for
the RNN layer alone and for the full flagship model forward, plus the
logits delta introduced by bf16 weights.
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

from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.ops.rnn import rnn_forward

cfg = Config()          # flagship
key = jax.random.PRNGKey(0)
params = model_init(cfg, key)
x = jax.random.uniform(jax.random.PRNGKey(1),
                       (cfg.batch_size, cfg.seg_len, cfg.feat_size))

# RNN layer alone
T, B, H = cfg.seg_len, cfg.batch_size, cfg.rnn_hidden_size
xr = jax.random.normal(jax.random.PRNGKey(2), (T, B, H)) * 0.05
rnn_p = params["rnn"]
for impl in ("scan", "pallas"):
    fn = jax.jit(lambda p, v, _i=impl: rnn_forward(p, v, impl=_i))
    dt = bench(fn, rnn_p, xr)
    say(f"rnn layer impl={impl:<6}: {dt*1e3:7.2f} ms")

# full model forward
outs = {}
for impl in ("scan", "pallas"):
    fn = jax.jit(lambda p, v, _i=impl: model_apply(cfg, p, v, rnn_impl=_i))
    outs[impl] = fn(params, x)
    sync(outs[impl])
    dt = bench(fn, params, x)
    say(f"model fwd impl={impl:<6}: {dt*1e3:7.2f} ms")

d = np.abs(np.asarray(outs["scan"]) - np.asarray(outs["pallas"]))
say(f"logits max|diff| = {d.max():.3e}  mean|diff| = {d.mean():.3e}")
say("ALL DONE")
