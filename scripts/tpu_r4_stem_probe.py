"""Probe conformer stem alternatives (r4): the two-conv subsample stem
measures 28.7 ms bf16 vs a ~12-14 ms roofline (conv2 alone is 1.81
TFLOP -> 9.2 ms at peak; measured implies ~37% MFU).

Variants (all numerically equivalent to lax.conv at bf16 resolution):
  A  current conv2d path (baseline)
  B  conv2 as 9 shift-GEMMs: y = sum_{di,dj} x[2t+di, 2f+dj] @ W[di,dj]
     — each GEMM is [M=384k, K=512] @ [512, 512], the MXU-optimal
     shape, at the cost of 9 accumulation passes
  C  conv2 via materialized patches + one GEMM (K=4608)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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

import dataclasses
from gasr_tpu.config import PRESETS
from gasr_tpu.models import model_init
from gasr_tpu.ops.conv import conv2d
from gasr_tpu.ops.linear import linear

cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
B, T, F = cfg.batch_size, cfg.seg_len, cfg.feat_size
params = model_init(cfg, jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
sync(x)
bf = jnp.bfloat16


def stem_a(p, xx):
    h = xx[:, :, :, None]
    h = conv2d(p["sub1"], h, (2, 2), compute_dtype=bf)
    h = conv2d(p["sub2"], h, (2, 2), compute_dtype=bf)
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(Bt, Tp, Fp * C)
    return linear(p["sub_proj"], h, activation=None, compute_dtype=bf)


def conv2_shift(p2, h1):
    """h1 [B, T1, F1, C] bf16 -> conv2 stride (2,2) SAME via 9 GEMMs."""
    Bt, T1, F1, C = h1.shape
    To, Fo = -(-T1 // 2), -(-F1 // 2)
    # SAME stride-2 k=3: pad_total = (To-1)*2 + 3 - T1
    pt = max((To - 1) * 2 + 3 - T1, 0)
    pf = max((Fo - 1) * 2 + 3 - F1, 0)
    hp = jnp.pad(h1, ((0, 0), (pt // 2, pt - pt // 2),
                      (pf // 2, pf - pf // 2), (0, 0)))
    w = p2["w"].astype(bf)                     # [3, 3, C, C]
    y = None
    for di in range(3):
        for dj in range(3):
            sl = lax.slice(hp, (0, di, dj, 0),
                           (Bt, di + 2 * (To - 1) + 1,
                            dj + 2 * (Fo - 1) + 1, C),
                           (1, 2, 2, 1))       # [B, To, Fo, C]
            g = jnp.dot(sl, w[di, dj],
                        preferred_element_type=jnp.float32)
            y = g if y is None else y + g
    y = jnp.clip(y + p2["b"], 0.0, 20.0).astype(bf)
    return y


def stem_b(p, xx):
    h = xx[:, :, :, None]
    h = conv2d(p["sub1"], h, (2, 2), compute_dtype=bf)
    h = conv2_shift(p["sub2"], h)
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(Bt, Tp, Fp * C)
    return linear(p["sub_proj"], h, activation=None, compute_dtype=bf)


def conv2_patch(p2, h1):
    Bt, T1, F1, C = h1.shape
    To, Fo = -(-T1 // 2), -(-F1 // 2)
    pt = max((To - 1) * 2 + 3 - T1, 0)
    pf = max((Fo - 1) * 2 + 3 - F1, 0)
    hp = jnp.pad(h1, ((0, 0), (pt // 2, pt - pt // 2),
                      (pf // 2, pf - pf // 2), (0, 0)))
    pieces = []
    for di in range(3):
        for dj in range(3):
            pieces.append(lax.slice(
                hp, (0, di, dj, 0),
                (Bt, di + 2 * (To - 1) + 1, dj + 2 * (Fo - 1) + 1, C),
                (1, 2, 2, 1)))
    xp = jnp.concatenate(pieces, axis=-1)       # [B, To, Fo, 9C]
    w = p2["w"].astype(bf).reshape(9 * C, C)
    y = jnp.dot(xp, w, preferred_element_type=jnp.float32)
    return jnp.clip(y + p2["b"], 0.0, 20.0).astype(bf)


def stem_c(p, xx):
    h = xx[:, :, :, None]
    h = conv2d(p["sub1"], h, (2, 2), compute_dtype=bf)
    h = conv2_patch(p["sub2"], h)
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(Bt, Tp, Fp * C)
    return linear(p["sub_proj"], h, activation=None, compute_dtype=bf)


ref = None
for name, fn in [("A conv2d   ", stem_a), ("B shiftGEMM", stem_b),
                 ("C patchGEMM", stem_c)]:
    f = jax.jit(lambda p, xx, _f=fn: _f(p, xx))
    out = f(params, x)
    sync(out)
    if ref is None:
        ref = out
    else:
        d = float(jnp.abs(ref.astype(jnp.float32)
                          - out.astype(jnp.float32)).max())
        say(f"  {name} maxdiff vs A: {d:.4f}")
    dt = bench(f, params, x, iters=10)
    say(f"STEM {name}: {dt*1e3:8.2f} ms")

say("ALL DONE")
