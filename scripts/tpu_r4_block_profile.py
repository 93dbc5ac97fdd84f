"""Post-flash conformer block composition (bf16, kernel path forced):
where do the ~2.9 ms/block go now? Plus full-model re-time with the
fused qkv GEMM."""
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


def bench(fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())

import dataclasses
from gasr_tpu.config import PRESETS
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.models.conformer import (_block, _block_init, _convmod,
                                       _ffn, _ln, _preset)
from gasr_tpu.ops.attention import mhsa_rel
from gasr_tpu.ops.pallas.flash_mhsa import flash_mhsa_rel

cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
hp = _preset(cfg)
d, heads, kernel = hp["d_model"], hp["num_heads"], hp["conv_kernel"]
B, Tp = cfg.batch_size, cfg.seg_len // 4
bf = jnp.bfloat16
blk = _block_init(jax.random.PRNGKey(2), d, heads, hp["ff_mult"], kernel)
h0 = jax.random.normal(jax.random.PRNGKey(3), (Tp, B, d)).astype(bf)
sync(h0)

comps = {
    "block": lambda p, hh: _block(p, hh, heads, kernel, None, bf),
    "mhsa(pallas)": lambda p, hh: mhsa_rel(
        p["mhsa"], _ln(p["mhsa_ln"], hh), heads, None,
        compute_dtype=bf, impl="pallas"),
    "mhsa(xla)": lambda p, hh: mhsa_rel(
        p["mhsa"], _ln(p["mhsa_ln"], hh), heads, None,
        compute_dtype=bf, impl="xla"),
    "ffn": lambda p, hh: _ffn(p["ff1"], hh, bf),
    "convmod": lambda p, hh: _convmod(p["conv"], hh, kernel, bf),
    "ln": lambda p, hh: _ln(p["ln_out"], hh),
}
for name, fn in comps.items():
    f = jax.jit(lambda p, hh, _f=fn: _f(p, hh))
    dt = bench(f, blk, h0)
    say(f"comp {name:12s}: {dt*1e3:8.3f} ms")

# kernel-only (pre-projected q/k/v) to isolate the flash kernel cost
dh = d // heads
q = jax.random.normal(jax.random.PRNGKey(4), (B, heads, Tp, dh),
                      jnp.float32)
lens = jnp.full((B,), Tp, jnp.int32)
fk = jax.jit(lambda qq: flash_mhsa_rel(qq, qq, qq, blk["mhsa"]["wr"],
                                       blk["mhsa"]["u"], blk["mhsa"]["v"],
                                       lens))
dt = bench(fk, q)
say(f"flash kernel only: {dt*1e3:8.3f} ms")

# full model re-time
params = model_init(cfg, jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1),
                       (B, cfg.seg_len, cfg.feat_size))
sync(x)
fn = jax.jit(lambda p, xx: model_apply(cfg, p, xx,
                                       compute_dtype=jnp.bfloat16))
say("compiling full fwd ...")
dt = bench(fn, params, x, iters=10)
say(f"FULL conformer_l bf16+flash+qkvfuse: {dt*1e3:8.2f} ms")
say("ALL DONE")
