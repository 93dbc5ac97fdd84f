"""Round-4 conformer_l forward profile (VERDICT r3 item #1: 229.5 ms,
~10% MFU at B=64 T=1200).

Stages:
  1. full fwd, f32 vs bf16 compute_dtype
  2. stem only (two conv2d + proj)
  3. marginal per-block cost (num_blocks 1 vs 5 -> slope)
  4. single-block component ablation at the post-subsample shape
     [T'=300, B=64, D=512]: ffn / mhsa / convmod (+ mhsa sub-parts)

Run: timeout 1800 python scripts/tpu_r4_conformer_profile.py
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

from gasr_tpu.config import PRESETS, Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.models.conformer import (_block, _block_init, _convmod,
                                       _ffn, _ln, _preset)
from gasr_tpu.ops.attention import mhsa_rel, mhsa_rel_init
import dataclasses

cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
B, T, F = cfg.batch_size, cfg.seg_len, cfg.feat_size
say(f"conformer_l B={B} T={T} F={F}")

params = model_init(cfg, jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
sync(x)

# ---- 1. full forward f32 vs bf16 ----
for name, cd in [("f32", None), ("bf16", jnp.bfloat16)]:
    fn = jax.jit(lambda p, xx, _cd=cd: model_apply(cfg, p, xx,
                                                   compute_dtype=_cd))
    say(f"compiling full fwd {name} ...")
    dt = bench(fn, params, x, iters=5)
    say(f"FULL fwd {name}: {dt*1e3:8.2f} ms")

# ---- 2. stem only ----
from gasr_tpu.ops.conv import conv2d
from gasr_tpu.ops.linear import linear


def stem(p, xx, cd):
    h = xx[:, :, :, None]
    h = conv2d(p["sub1"], h, (2, 2), compute_dtype=cd)
    h = conv2d(p["sub2"], h, (2, 2), compute_dtype=cd)
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(Bt, Tp, Fp * C)
    return linear(p["sub_proj"], h, activation=None, compute_dtype=cd)


for name, cd in [("f32", None), ("bf16", jnp.bfloat16)]:
    fn = jax.jit(lambda p, xx, _cd=cd: stem(p, xx, _cd))
    dt = bench(fn, params, x, iters=5)
    say(f"STEM {name}: {dt*1e3:8.2f} ms")

# ---- 3. marginal per-block ----
for nb in (1, 5):
    c2 = dataclasses.replace(cfg, num_blocks=nb)
    p2 = model_init(c2, jax.random.PRNGKey(0))
    for name, cd in [("f32", None), ("bf16", jnp.bfloat16)]:
        fn = jax.jit(lambda p, xx, _c2=c2, _cd=cd: model_apply(
            _c2, p, xx, compute_dtype=_cd))
        dt = bench(fn, p2, x, iters=5)
        say(f"nb={nb} {name}: {dt*1e3:8.2f} ms")

# ---- 4. single-block components at [T'=300, B=64, D=512] ----
hp = _preset(cfg)
d, heads, kernel = hp["d_model"], hp["num_heads"], hp["conv_kernel"]
Tp = T // 4
blk = _block_init(jax.random.PRNGKey(2), d, heads, hp["ff_mult"], kernel)
h0 = jax.random.normal(jax.random.PRNGKey(3), (Tp, B, d))
sync(h0)

for name, cd in [("f32", None), ("bf16", jnp.bfloat16)]:
    h = h0 if cd is None else h0.astype(cd)
    comps = {
        "block": jax.jit(lambda p, hh, _cd=cd: _block(
            p, hh, heads, kernel, None, _cd)),
        "ffn": jax.jit(lambda p, hh, _cd=cd: _ffn(p["ff1"], hh, _cd)),
        "mhsa": jax.jit(lambda p, hh, _cd=cd: mhsa_rel(
            p["mhsa"], _ln(p["mhsa_ln"], hh), heads, None,
            compute_dtype=_cd)),
        "convmod": jax.jit(lambda p, hh, _cd=cd: _convmod(
            p["conv"], hh, kernel, _cd)),
        "ln": jax.jit(lambda p, hh: _ln(p["ln_out"], hh)),
    }
    for cname, fn in comps.items():
        dt = bench(fn, blk, h, iters=20)
        say(f"comp {name} {cname:8s}: {dt*1e3:8.3f} ms")

# mhsa sub-parts (bf16): projections only vs scores vs full
import math
from gasr_tpu.ops.attention import _rel_shift, _sinusoid_pos

mp = blk["mhsa"]


def mhsa_parts(stage, hh, cd=jnp.bfloat16):
    Tn, Bn, D = hh.shape
    dh = D // heads
    c = lambda a: a.astype(cd)

    def proj(w, inp):
        return jnp.einsum("tbd,de->tbe", c(inp), c(w),
                          preferred_element_type=jnp.float32)

    q = c(proj(mp["wq"], hh)).reshape(Tn, Bn, heads, dh)
    k = c(proj(mp["wk"], hh)).reshape(Tn, Bn, heads, dh)
    v = c(proj(mp["wv"], hh)).reshape(Tn, Bn, heads, dh)
    if stage == "proj":
        return q.sum() + k.sum() + v.sum()
    r = _sinusoid_pos(Tn, D) @ mp["wr"]
    r = c(r).reshape(2 * Tn - 1, heads, dh)
    ac = jnp.einsum("tbhd,sbhd->bhts", q + c(mp["u"])[None, None], k,
                    preferred_element_type=jnp.float32)
    if stage == "ac":
        return ac.sum()
    bd = jnp.einsum("tbhd,lhd->bhtl", q + c(mp["v"])[None, None], r,
                    preferred_element_type=jnp.float32)
    bd = _rel_shift(c(bd))
    if stage == "bd":
        return ac.sum() + bd.astype(jnp.float32).sum()
    scores = (ac + bd.astype(jnp.float32)) / math.sqrt(dh)
    attn = c(jax.nn.softmax(scores, axis=-1))
    if stage == "softmax":
        return attn.sum()
    out = jnp.einsum("bhts,sbhd->tbhd", attn, v,
                     preferred_element_type=jnp.float32)
    out = c(out).reshape(Tn, Bn, D)
    return jnp.einsum("tbd,de->tbe", out, c(mp["wo"]),
                      preferred_element_type=jnp.float32)


hb = h0.astype(jnp.bfloat16)
for stage in ("proj", "ac", "bd", "softmax", "full"):
    fn = jax.jit(lambda hh, _s=stage: mhsa_parts(_s, hh))
    dt = bench(fn, hb, iters=20)
    say(f"mhsa[{stage:7s}] bf16: {dt*1e3:8.3f} ms")

# convmod sub-parts (bf16): pointwise-only vs +depthwise
def conv_parts(stage, hh, cd=jnp.bfloat16):
    from jax import lax
    p = blk["conv"]
    h = _ln(p["ln"], hh)
    h = linear(p["pw1"], h, activation=None, compute_dtype=cd).astype(cd)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)
    if stage == "pw1":
        return h.sum()
    hw = jnp.transpose(h, (1, 0, 2))
    D = hw.shape[-1]
    hw = lax.conv_general_dilated(
        hw, p["dw"].astype(cd), window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=D,
        preferred_element_type=jnp.float32) + p["dw_b"]
    hw = hw.astype(cd)
    h = jnp.transpose(hw, (1, 0, 2))
    if stage == "dw":
        return h.sum()
    h = _ln(p["ln2"], h)
    h = h * jax.nn.sigmoid(h)
    return linear(p["pw2"], h, activation=None, compute_dtype=cd)


for stage in ("pw1", "dw", "full"):
    fn = jax.jit(lambda hh, _s=stage: conv_parts(_s, hh))
    dt = bench(fn, hb, iters=20)
    say(f"conv[{stage:4s}] bf16: {dt*1e3:8.3f} ms")

say("ALL DONE")
