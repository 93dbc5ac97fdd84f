"""r5 hardware probe #2 (post-fix round), one TPU claim:

S. Fused parity-plane stem kernel: Mosaic compile, numerics vs XLA
   stem, timing + block sweep, full conformer_l fwd with/without.
D. conformer_l bf16 train RETRY with the batch-chunked flash backward
   (the unchunked bwd blew up the remote compile helper in probe #1).
E. CTC-loss hoist+unroll re-measure (was 16.5 ms of the 86 ms flagship
   step) + full train step; streaming re-measure with the one-hot
   MXU reorder (was 75.5 ms vs batch 62.5) + on-TPU bit-equality of
   streaming vs batch decode (Precision.HIGHEST int-exactness check).

Run: timeout 3600 python scripts/tpu_r5_probe2.py [S|D|E ...]
"""
import dataclasses
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
sections = set(sys.argv[1:]) or {"S", "D", "E"}

from gasr_tpu.config import PRESETS, Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch

bf = jnp.bfloat16

# ---------------------------------------------------------------- S
if "S" in sections:
    from gasr_tpu.ops.pallas.stem import (_fused_stem_fwd, fused_stem,
                                          stem_ref)
    cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
    B, T, F = cfg.batch_size, cfg.seg_len, cfg.feat_size
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
    sync(x)
    w = (params["sub1"]["w"], params["sub1"]["b"],
         params["sub2"]["w"], params["sub2"]["b"],
         params["sub_proj"]["w"], params["sub_proj"]["b"])
    say("\n=== S: fused stem (conformer_l shape) ===")
    say("compiling fused stem kernel (Mosaic) ...")
    fk = jax.jit(lambda x: fused_stem(x, *w, out_dtype=bf))
    try:
        got = fk(x)
        sync(got)
        ok = True
    except Exception as e:           # noqa: BLE001
        say("FUSED STEM COMPILE/RUN FAILED:", str(e)[:1500])
        ok = False
    if ok:
        refj = jax.jit(lambda x: stem_ref(x, *w, out_dtype=bf))
        ref = refj(x)
        sync(ref)
        d = float(jnp.abs(got.astype(jnp.float32)
                          - ref.astype(jnp.float32)).max())
        s = float(jnp.abs(ref.astype(jnp.float32)).max())
        say(f"numerics: max|diff|={d:.5f} scale={s:.3f} "
            f"({'OK' if d < 0.05 * max(s, 1.0) else 'MISMATCH'})")
        say(f"stem XLA   : {bench(refj, x)*1e3:8.2f} ms")
        say(f"stem fused : {bench(fk, x)*1e3:8.2f} ms")
        for blk in (32, 64, 128):
            try:
                fb = jax.jit(functools.partial(
                    lambda x, blk: _fused_stem_fwd(x, *w, blk=blk,
                                                   out_dtype=bf),
                    blk=blk))
                say(f"stem fused blk={blk:3d}: {bench(fb, x)*1e3:8.2f} ms")
            except Exception as e:   # noqa: BLE001
                say(f"stem fused blk={blk:3d}: FAILED {str(e)[:150]}")
        for impl in ("xla", "pallas"):
            ffwd = jax.jit(functools.partial(
                lambda p, xx, impl: model_apply(cfg, p, xx,
                                                compute_dtype=bf,
                                                stem_impl=impl),
                impl=impl))
            say(f"conformer_l fwd stem_impl={impl:6s}: "
                f"{bench(ffwd, params, x, iters=5)*1e3:8.2f} ms")

# ---------------------------------------------------------------- D
if "D" in sections:
    say("\n=== D: conformer_l bf16 train (chunked flash bwd) ===")
    cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
    sync(batch)
    for name, kw in [("bf16", {"compute_dtype": bf}),
                     ("bf16+remat", {"compute_dtype": bf,
                                     "remat": True})]:
        params = model_init(cfg, jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, opt, **kw),
                       donate_argnums=(0, 1))
        say(f"compiling conformer_l train {name} ...")
        try:
            params, opt_state, m = step(params, opt_state, batch)
            sync(m)
        except Exception as e:       # noqa: BLE001
            say(f"train {name} FAILED: {str(e)[:600]}")
            continue
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            params, opt_state, m = step(params, opt_state, batch)
        sync(m)
        dt = (time.perf_counter() - t0) / iters
        say(f"conformer_l train {name:10s}: {dt*1e3:8.2f} ms/step "
            f"loss={float(m['loss']):.3f}")

# ---------------------------------------------------------------- E
if "E" in sections:
    say("\n=== E: CTC hoist+unroll / train step / streaming rework ===")
    from gasr_tpu.ops.ctc_loss import ctc_loss
    cfg = Config()
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
    sync(batch)
    params = model_init(cfg, jax.random.PRNGKey(0))

    def loss_fn(p, b):
        lp = model_apply(cfg, p, b["inputs"])
        losses = ctc_loss(lp, b["labels"], b["input_lengths"],
                          b["label_lengths"], blank_id=cfg.blank_id)
        norm = jnp.maximum(b["label_lengths"].astype(jnp.float32), 1.0)
        return (losses / norm).mean()

    fwd_only = jax.jit(lambda p, b: model_apply(cfg, p, b["inputs"]))
    fwd_ctc = jax.jit(loss_fn)
    vag = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b))
    full = jax.jit(make_train_step(cfg, opt))
    opt_state = opt.init(params)
    say("compiling 4 stages ...")
    t_f = bench(fwd_only, params, batch)
    t_fc = bench(fwd_ctc, params, batch)
    t_g = bench(vag, params, batch)
    t_s = bench(full, params, opt_state, batch)
    say(f"fwd only        : {t_f*1e3:8.2f} ms")
    say(f"fwd+ctc         : {t_fc*1e3:8.2f} ms   (ctc ~ "
        f"{(t_fc-t_f)*1e3:.2f}; was 16.48)")
    say(f"value_and_grad  : {t_g*1e3:8.2f} ms   (bwd ~ "
        f"{(t_g-t_fc)*1e3:.2f}; was 50.25)")
    say(f"full step       : {t_s*1e3:8.2f} ms   (was 86.07)")

    # streaming re-measure + on-TPU equality vs batch decode
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
    say("compiling streaming ...")
    res_s = run_stream()
    res_b = bd(lp)
    sync(res_s)
    sync(res_b)
    eq_tok = bool(jnp.array_equal(res_s.tokens, res_b.tokens))
    eq_ts = bool(jnp.array_equal(res_s.timesteps, res_b.timesteps))
    say(f"streaming == batch on TPU: tokens={eq_tok} timesteps={eq_ts}")
    t_st = bench(lambda: run_stream().tokens)
    t_bd = bench(lambda: bd(lp).tokens)
    say(f"streaming Tc=20 : {t_st*1e3:8.2f} ms  (was 75.55)")
    say(f"batch decode    : {t_bd*1e3:8.2f} ms  (was 62.52)")

say("\nALL DONE")
