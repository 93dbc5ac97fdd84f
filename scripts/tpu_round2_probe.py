"""Round-2 TPU measurement batch (one long-lived session).

Covers VERDICT items: decode stage profile at the REAL flagship
max_len=256 (item 1 follow-up), Pallas LSTM vs scan at bilstm_2x256
(item 5), TP decode hardware compile on a mesh of 1 (item 9), bf16
forward (item 8), conformer_s decode on the XLA path at V=129 (item 6).
Flushed prints; every section independent so a crash leaves a trail.
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

# ---------------- 1. decode stage profile at flagship (L=256!) ----------
say("=== decode profile, flagship B=256 T=200 V=47 W=100 L=256")
B, T, V, W, L = 256, 200, 47, 100, 256
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)

from gasr_tpu.decoder.beam_search import (ctc_beam_search, _pallas_scan,
                                          _init_beam, _traceback)
from gasr_tpu.ops.pallas.fused_decode import traceback_pallas

scan_fn = jax.jit(lambda p: _pallas_scan(p, _init_beam(B, W, True), W, V, 0))
final, packed_ys = scan_fn(lp)
sync(packed_ys)
t_scan = bench("scan kernel (pallas whole-scan)", scan_fn, lp)

tb_p = jax.jit(lambda ys, fl: traceback_pallas(ys, fl, L))
t_tb = bench("traceback_pallas L=256 (BBLK=40)", tb_p, packed_ys,
             final.length)

fused = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                          merge_impl="pallas", max_len=L))
t_e2e = bench("decode e2e (ctc_beam_search, L=256)", fused, lp)
say(f"epilogue (e2e - scan - tb): {(t_e2e-t_scan-t_tb)*1e3:.2f} ms")

# ---------------- 2. bf16 forward at flagship ---------------------------
say("=== forward f32 vs bf16, flagship")
from gasr_tpu.config import Config, PRESETS
from gasr_tpu.models import model_apply, model_init

cfg = Config()
params = model_init(cfg, jax.random.PRNGKey(0))
x = jax.random.uniform(jax.random.PRNGKey(1),
                       (cfg.batch_size, cfg.seg_len, cfg.feat_size))
fwd32 = jax.jit(lambda p, x: model_apply(cfg, p, x))
fwd16 = jax.jit(lambda p, x: model_apply(cfg, p, x,
                                         compute_dtype=jnp.bfloat16))
bench("forward f32", fwd32, params, x)
bench("forward bf16 (params f32)", fwd16, params, x)
lp32 = fwd32(params, x)
lp16 = fwd16(params, x)
d = jnp.max(jnp.abs(lp32 - lp16.astype(jnp.float32)))
say(f"max |logprob diff| f32 vs bf16: {float(d):.5f}")
r32 = ctc_beam_search(lp32, beam_width=cfg.beam_width, max_len=64)
r16 = ctc_beam_search(lp16.astype(jnp.float32), beam_width=cfg.beam_width,
                      max_len=64)
same = np.mean((np.asarray(r32.tokens[:, 0]) ==
                np.asarray(r16.tokens[:, 0])).all(axis=-1))
say(f"top-1 transcript agreement f32 vs bf16 (random logits): {same:.3f}")

# ---------------- 3. Pallas LSTM vs scan at bilstm_2x256 ---------------
say("=== bilstm_2x256 forward: scan vs pallas rnn_impl")
cfg_b = PRESETS["bilstm_2x256"]
pb = model_init(cfg_b, jax.random.PRNGKey(0))
xb = jax.random.uniform(jax.random.PRNGKey(1),
                        (cfg_b.batch_size, cfg_b.seg_len, cfg_b.feat_size))
f_scan = jax.jit(lambda p, x: model_apply(cfg_b, p, x, rnn_impl="scan"))
f_pal = jax.jit(lambda p, x: model_apply(cfg_b, p, x, rnn_impl="pallas"))
bench("bilstm scan", f_scan, pb, xb)
try:
    bench("bilstm pallas", f_pal, pb, xb)
    o1, o2 = f_scan(pb, xb), f_pal(pb, xb)
    say(f"bilstm scan-vs-pallas max diff: "
        f"{float(jnp.max(jnp.abs(o1 - o2))):.5f} (pallas whh bf16)")
except Exception as e:
    say(f"bilstm pallas FAILED: {type(e).__name__}: {str(e)[:300]}")

# ---------------- 4. conformer_s decode (V=129, XLA path) ---------------
say("=== conformer_s decode: V=129 just misses the fused kernel")
cfg_c = PRESETS["conformer_s"]
Vc, Wc = cfg_c.output_size, cfg_c.beam_width
lpc = jnp.asarray(
    rng.standard_normal((cfg_c.seg_len, cfg_c.batch_size, Vc))
    .astype(np.float32))
lpc = lpc - jax.scipy.special.logsumexp(lpc, axis=-1, keepdims=True)
dec_c = jax.jit(lambda p: ctc_beam_search(p, beam_width=Wc,
                                          merge_impl="matched",
                                          max_len=cfg_c.decode_max_len))
bench(f"conformer_s decode XLA matched (T={cfg_c.seg_len} "
      f"B={cfg_c.batch_size} V={Vc} W={Wc})", dec_c, lpc, iters=3)

# ---------------- 5. TP decode compile on hardware (mesh of 1) ----------
say("=== TP decode shard_map program on a 1-chip TPU mesh")
try:
    from jax.sharding import Mesh
    from gasr_tpu.parallel.decode_tp import ctc_beam_search_tp
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("model",))
    lps = jnp.asarray(rng.standard_normal((12, 4, 17)).astype(np.float32))
    lps = lps - jax.scipy.special.logsumexp(lps, axis=-1, keepdims=True)
    r_tp = ctc_beam_search_tp(lps, beam_width=8, mesh=mesh1, max_len=32)
    sync(r_tp)
    r_ref = ctc_beam_search(lps, beam_width=8, merge_impl="matched",
                            max_len=32)
    ok = np.array_equal(np.asarray(r_tp.tokens), np.asarray(r_ref.tokens))
    say(f"TP decode compiles + runs on TPU mesh(1); tokens match: {ok}")
except Exception as e:
    say(f"TP decode on TPU FAILED: {type(e).__name__}: {str(e)[:400]}")

say("ALL DONE")
