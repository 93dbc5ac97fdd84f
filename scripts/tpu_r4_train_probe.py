"""Flagship training-step timing on the real chip (r4): the train path
(CTC loss + adamw) had only ever run on CPU tests. Times f32 / bf16 /
bf16+remat at the reference shape B=256 T=200 H=2048.
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


say("devices:", jax.devices())

from gasr_tpu.config import Config
from gasr_tpu.models import model_init
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch

cfg = Config()                 # flagship reference shape
opt = make_optimizer()
batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
sync(batch)

for name, kw in [("f32", {}),
                 ("bf16", {"compute_dtype": jnp.bfloat16}),
                 ("bf16+remat", {"compute_dtype": jnp.bfloat16,
                                 "remat": True})]:
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, **kw), donate_argnums=(0, 1))
    say(f"compiling train step {name} ...")
    params, opt_state, m = step(params, opt_state, batch)
    sync(m)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        params, opt_state, m = step(params, opt_state, batch)
    sync(m)
    dt = (time.perf_counter() - t0) / iters
    say(f"train {name:10s}: {dt*1e3:8.2f} ms/step  "
        f"loss={float(m['loss']):.3f}")
say("ALL DONE")
