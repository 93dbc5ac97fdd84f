"""r5 hardware probe #4: (a) streaming with the active-prefix bound,
(b) bilstm small-preset traceback tblk sweep (the walk is ~6 ms of the
13.5 ms decode there), (c) flagship fwd+decode sanity (no regression
from the r5 batch of changes).

Run: timeout 3600 python scripts/tpu_r5_probe4.py
"""
import functools
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

from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import streaming_init, streaming_step

# ---------------------------------------------------------------- (a)
say("\n=== streaming with active_len (flagship) ===")
T, B, V, W, Tc, L = 200, 256, 47, 100, 20, 256
rng = np.random.default_rng(0)
xx = rng.standard_normal((T, B, V)).astype(np.float32)
lp = jnp.asarray(xx - np.log(np.exp(xx).sum(-1, keepdims=True)))
sync(lp)


def run_stream(use_la):
    st = streaming_init(B, W, max_len=L)
    res = None
    for c in range(T // Tc):
        la = (min(L, -(-((c + 1) * Tc) // 64) * 64) if use_la else None)
        st, res = streaming_step(st, lp[c * Tc:(c + 1) * Tc],
                                 active_len=la)
    return res


bd = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=L))
say("compiling ...")
ra = run_stream(True)
rb = bd(lp)
sync(ra)
sync(rb)
say("active_len streaming == batch on TPU:",
    bool(jnp.array_equal(ra.tokens, rb.tokens)),
    bool(jnp.array_equal(ra.timesteps, rb.timesteps)))
t_la = bench(lambda: run_stream(True).tokens)
t_full = bench(lambda: run_stream(False).tokens)
t_bd = bench(lambda: bd(lp).tokens)
say(f"streaming active_len : {t_la*1e3:8.2f} ms")
say(f"streaming full-L     : {t_full*1e3:8.2f} ms")
say(f"batch decode         : {t_bd*1e3:8.2f} ms  "
    f"(ratio {t_la/t_bd:.3f}x)")

# ---------------------------------------------------------------- (b)
say("\n=== bilstm traceback tblk sweep (T=400 B=16 V=29 W=10) ===")
from gasr_tpu.decoder.beam_search import _init_beam, _pallas_scan
from gasr_tpu.ops.pallas.fused_decode import pack_state, traceback_pallas

T2, B2, V2, W2, L2 = 400, 16, 29, 10, 256
x2 = rng.standard_normal((T2, B2, V2)).astype(np.float32)
lp2 = jnp.asarray(x2 - np.log(np.exp(x2).sum(-1, keepdims=True)))
sync(lp2)
dec2 = jax.jit(functools.partial(_pallas_scan, W=W2, V=V2, blank_id=0))
final2, ys2 = dec2(lp2, _init_beam(B2, W2, True))
sync(ys2)
L_eff = min(L2, T2)
ref_tb = None
for tblk in (4, 8, 16, 32, 50):
    try:
        tb = jax.jit(functools.partial(
            traceback_pallas, L=L_eff, tblk=tblk, interpret=False))
        out = tb(ys2, final2.length)
        sync(out)
        if ref_tb is None:
            ref_tb = out
            eq = True
        else:
            eq = all(bool(jnp.array_equal(a, b))
                     for a, b in zip(out, ref_tb))
        t = bench(lambda ys, ln, tb=tb: tb(ys, ln)[0], ys2,
                  final2.length, iters=20)
        say(f"traceback tblk={tblk:3d}: {t*1e3:8.2f} ms  bit-eq={eq}")
    except Exception as e:               # noqa: BLE001
        say(f"traceback tblk={tblk:3d}: FAILED {str(e)[:150]}")

full_dec = jax.jit(lambda l: ctc_beam_search(
    l, beam_width=W2, max_len=L2, merge_impl="pallas").tokens)
say(f"bilstm full decode   : {bench(full_dec, lp2)*1e3:8.2f} ms")

# ---------------------------------------------------------------- (c)
say("\n=== flagship fwd + decode sanity ===")
from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init

cfg = Config()
params = model_init(cfg, jax.random.PRNGKey(0))
xf = jax.random.uniform(jax.random.PRNGKey(1),
                        (cfg.batch_size, cfg.seg_len, cfg.feat_size))
sync(xf)
fwd = jax.jit(lambda p, x: model_apply(cfg, p, x))
lpf = fwd(params, xf)
sync(lpf)
say(f"flagship fwd   : {bench(fwd, params, xf)*1e3:8.2f} ms "
    f"(r4: 17.6-18.1)")
decf = jax.jit(lambda l: ctc_beam_search(
    l, beam_width=cfg.beam_width, max_len=cfg.decode_max_len).tokens)
say(f"flagship decode: {bench(decf, lpf)*1e3:8.2f} ms (r4: 63.7-70.9)")

say("\nALL DONE")
