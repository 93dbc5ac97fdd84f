"""r5 hardware probe #5: (a) FUSED traceback+reorder+overlay streaming
kernel — bit-equality vs batch on hardware + timing vs the 75.1 ms
XLA-overlay path and the 1.15x-batch target; (b) conformer_l train
backward chunk-size sweep (_BWD_SCORE_BYTES); (c) conformer_s train
re-measure with the one-hot CTC.

Run: timeout 3600 python scripts/tpu_r5_probe5.py [a|b|c ...]
"""
import dataclasses
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
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())
sections = set(sys.argv[1:]) or {"a", "b", "c"}

from gasr_tpu.config import PRESETS
from gasr_tpu.models import model_init
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch

bf = jnp.bfloat16

if "a" in sections:
    say("\n=== a: fused streaming kernel (flagship) ===")
    from gasr_tpu.decoder import ctc_beam_search
    from gasr_tpu.decoder.beam_search import (streaming_init,
                                              streaming_step)
    T, B, V, W, Tc, L = 200, 256, 47, 100, 20, 256
    rng = np.random.default_rng(0)
    xx = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(xx - np.log(np.exp(xx).sum(-1, keepdims=True)))
    sync(lp)

    def run_stream():
        st = streaming_init(B, W, max_len=L)
        res = None
        for c in range(T // Tc):
            st, res = streaming_step(st, lp[c * Tc:(c + 1) * Tc])
        return res

    bd = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=L))
    say("compiling ...")
    try:
        ra = run_stream()
        sync(ra)
    except Exception as e:           # noqa: BLE001
        say("FUSED STREAMING FAILED:", str(e)[:1200])
        sections.discard("a")
        ra = None
    if ra is not None:
        rb = bd(lp)
        sync(rb)
        say("fused streaming == batch on TPU:",
            bool(jnp.array_equal(ra.tokens, rb.tokens)),
            bool(jnp.array_equal(ra.timesteps, rb.timesteps)),
            bool(jnp.array_equal(ra.lengths, rb.lengths)))
        t_st = bench(lambda: run_stream().tokens)
        t_bd = bench(lambda: bd(lp).tokens)
        say(f"streaming fused-kernel : {t_st*1e3:8.2f} ms "
            f"(XLA-overlay path was 75.1)")
        say(f"batch decode           : {t_bd*1e3:8.2f} ms  "
            f"(ratio {t_st/t_bd:.3f}x; target <= 1.15x)")

if "b" in sections:
    say("\n=== b: conformer_l bwd chunk sweep ===")
    from gasr_tpu.ops.pallas import flash_mhsa as fm
    cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
    sync(batch)
    for mb in (24, 48, 96):
        fm._BWD_SCORE_BYTES = mb * 2**20
        params = model_init(cfg, jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, opt, compute_dtype=bf),
                       donate_argnums=(0, 1))
        say(f"compiling train (bwd chunk {mb} MiB) ...")
        try:
            params, opt_state, m = step(params, opt_state, batch)
            sync(m)
        except Exception as e:       # noqa: BLE001
            say(f"chunk {mb} MiB: FAILED {str(e)[:300]}")
            continue
        t0 = time.perf_counter()
        for _ in range(5):
            params, opt_state, m = step(params, opt_state, batch)
        sync(m)
        say(f"conformer_l train bf16, bwd chunk {mb:3d} MiB: "
            f"{(time.perf_counter()-t0)/5*1e3:8.2f} ms/step "
            f"loss={float(m['loss']):.3f}")
    fm._BWD_SCORE_BYTES = 48 * 2**20

if "c" in sections:
    say("\n=== c: conformer_s train re-measure (one-hot CTC) ===")
    cfg = dataclasses.replace(PRESETS["conformer_s"], mesh_shape={})
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
    sync(batch)
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, compute_dtype=bf),
                   donate_argnums=(0, 1))
    say("compiling ...")
    params, opt_state, m = step(params, opt_state, batch)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(10):
        params, opt_state, m = step(params, opt_state, batch)
    sync(m)
    say(f"conformer_s train bf16: {(time.perf_counter()-t0)/10*1e3:8.2f} "
        f"ms/step (was 42.6 with scan-gather CTC)")

say("\nALL DONE")
