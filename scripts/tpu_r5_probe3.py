"""r5 hardware probe #3, one TPU claim:

S2. Stem kernel inner=dot3d (9 big 3D dots) vs inner=loop (200 small
    matmuls, the probe-2 loser at 38.6 ms) vs XLA stem; blk sweep;
    full conformer_l fwd both ways.
E2. CTC one-hot-einsum emission lookup (take_along_axis hoist measured
    WORSE in probe 2: 25.8 ms) — fwd+ctc stage + full flagship step.
C2. Streaming micro-stages of the CURRENT code: einsum reorder alone,
    overlay-select loop alone, traceback alone, full streaming_step,
    and a donated-state variant — probe 2 showed the one-hot reorder
    didn't move the total (75.3 ms), so the 13 ms over the chunks-only
    floor needs a correct attribution.
F.  Small-preset decode audit (bilstm B=16 W=10 V=29; conformer_l
    W=16 V=129): dispatch vs forced paths, kernel knob sweep.

Run: timeout 3600 python scripts/tpu_r5_probe3.py [S2|E2|C2|F ...]
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
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())
sections = set(sys.argv[1:]) or {"S2", "E2", "C2", "F"}

from gasr_tpu.config import PRESETS, Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch

bf = jnp.bfloat16

# ---------------------------------------------------------------- S2
if "S2" in sections:
    from gasr_tpu.ops.pallas.stem import _fused_stem_fwd, stem_ref
    cfg = dataclasses.replace(PRESETS["conformer_l"], mesh_shape={})
    B, T, F = cfg.batch_size, cfg.seg_len, cfg.feat_size
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
    sync(x)
    w = (params["sub1"]["w"], params["sub1"]["b"],
         params["sub2"]["w"], params["sub2"]["b"],
         params["sub_proj"]["w"], params["sub_proj"]["b"])
    say("\n=== S2: stem inner=dot3d vs loop vs XLA ===")
    refj = jax.jit(lambda x: stem_ref(x, *w, out_dtype=bf))
    ref = refj(x)
    sync(ref)
    say(f"stem XLA            : {bench(refj, x)*1e3:8.2f} ms")
    for inner in ("dot3d", "loop"):
        for blk in (32, 64):
            try:
                fb = jax.jit(functools.partial(
                    lambda x, blk, inner: _fused_stem_fwd(
                        x, *w, blk=blk, out_dtype=bf, inner=inner),
                    blk=blk, inner=inner))
                got = fb(x)
                sync(got)
                d = float(jnp.abs(got.astype(jnp.float32)
                                  - ref.astype(jnp.float32)).max())
                t = bench(fb, x)
                say(f"stem {inner:6s} blk={blk:3d}: {t*1e3:8.2f} ms  "
                    f"maxdiff={d:.4f}")
            except Exception as e:   # noqa: BLE001
                say(f"stem {inner:6s} blk={blk:3d}: FAILED "
                    f"{str(e)[:300]}")
    for impl in ("xla", "pallas"):
        try:
            ffwd = jax.jit(functools.partial(
                lambda p, xx, impl: model_apply(cfg, p, xx,
                                                compute_dtype=bf,
                                                stem_impl=impl),
                impl=impl))
            say(f"conformer_l fwd stem_impl={impl:6s}: "
                f"{bench(ffwd, params, x, iters=5)*1e3:8.2f} ms")
        except Exception as e:       # noqa: BLE001
            say(f"conformer_l fwd stem_impl={impl}: FAILED "
                f"{str(e)[:200]}")

# ---------------------------------------------------------------- E2
if "E2" in sections:
    say("\n=== E2: CTC one-hot emission lookup ===")
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
    full = jax.jit(make_train_step(cfg, opt))
    opt_state = opt.init(params)
    t_f = bench(fwd_only, params, batch)
    t_fc = bench(fwd_ctc, params, batch)
    t_s = bench(full, params, opt_state, batch)
    say(f"fwd only   : {t_f*1e3:8.2f} ms")
    say(f"fwd+ctc    : {t_fc*1e3:8.2f} ms   (ctc ~ {(t_fc-t_f)*1e3:.2f}; "
        f"scan-gather was 16.5, hoist-gather 25.8)")
    say(f"full step  : {t_s*1e3:8.2f} ms   (was 86.1 / 98.0)")

# ---------------------------------------------------------------- C2
if "C2" in sections:
    say("\n=== C2: streaming micro-stages (current code) ===")
    from gasr_tpu.decoder import ctc_beam_search
    from gasr_tpu.decoder.beam_search import (streaming_init,
                                              streaming_step)
    T, B, V, W, Tc, L = 200, 256, 47, 100, 20, 256
    n_chunks = T // Tc
    rng = np.random.default_rng(0)
    xx = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(xx - np.log(np.exp(xx).sum(-1, keepdims=True)))
    sync(lp)

    # micro: one-hot reorder alone
    sp = jnp.asarray(rng.integers(0, W, (B, W)), jnp.int32)
    base_tok = jnp.asarray(rng.integers(-1, V, (B, W, L)), jnp.int32)
    base_ts = jnp.asarray(rng.integers(-1, T, (B, W, L)), jnp.int32)

    @jax.jit
    def reorder(sp, bt, bts):
        onehot = (sp[:, :, None]
                  == jnp.arange(W, dtype=jnp.int32)[None, None, :]
                  ).astype(jnp.float32)
        cat = jnp.concatenate([bt, bts], axis=2).astype(jnp.float32)
        return jnp.einsum("bvw,bwl->bvl", onehot, cat,
                          precision=lax.Precision.HIGHEST
                          ).astype(jnp.int32)

    say(f"reorder einsum alone : "
        f"{bench(reorder, sp, base_tok, base_ts)*1e3:8.2f} ms/chunk-eq")

    k_tok = jnp.asarray(rng.integers(-1, V, (B, W, Tc)), jnp.int32)
    k_rel = jnp.asarray(rng.integers(-1, Tc, (B, W, Tc)), jnp.int32)
    off = jnp.asarray(rng.integers(0, L - Tc, (B, W, 1)), jnp.int32)

    @jax.jit
    def overlay(cat, k_tok, k_rel, off):
        relidx = jnp.concatenate(
            [jnp.arange(L, dtype=jnp.int32)] * 2)[None, None, :]
        is_tok = (jnp.arange(2 * L) < L)[None, None, :]
        for j in range(Tc):
            pos_j = off + j
            tok_j = k_tok[:, :, j:j + 1]
            t_j = k_rel[:, :, j:j + 1]
            hit = (relidx == pos_j) & (tok_j >= 0)
            val = jnp.where(is_tok, tok_j, t_j + 100)
            cat = jnp.where(hit, val, cat)
        return cat

    cat0 = jnp.concatenate([base_tok, base_ts], axis=2)
    say(f"overlay loop alone   : "
        f"{bench(overlay, cat0, k_tok, k_rel, off)*1e3:8.2f} ms/chunk-eq")

    def run_stream():
        st = streaming_init(B, W, max_len=L)
        res = None
        for c in range(n_chunks):
            st, res = streaming_step(st, lp[c * Tc:(c + 1) * Tc])
        return res.tokens

    # donated-state variant: same math, state buffers donated per call
    from gasr_tpu.decoder import beam_search as bs
    don_step = jax.jit(bs.streaming_step.__wrapped__,
                       static_argnames=("blank_id", "algorithm",
                                        "prob_domain", "is_final",
                                        "merge_impl"),
                       donate_argnums=(0,))

    def run_stream_don():
        st = streaming_init(B, W, max_len=L)
        res = None
        for c in range(n_chunks):
            st, res = don_step(st, lp[c * Tc:(c + 1) * Tc])
        return res.tokens

    bd = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=L))
    say("compiling streaming variants ...")
    say(f"full streaming       : {bench(run_stream)*1e3:8.2f} ms")
    say(f"streaming donated    : {bench(run_stream_don)*1e3:8.2f} ms")
    say(f"batch decode         : {bench(lambda: bd(lp).tokens)*1e3:8.2f} ms")

# ---------------------------------------------------------------- F
if "F" in sections:
    say("\n=== F: small-preset decode audit ===")
    src = open(os.path.join(os.path.dirname(__file__),
                            "tpu_r5_small_preset_probe.py")).read()
    src = src.split('say("devices:", jax.devices())', 1)[1]
    exec(src)                        # noqa: S102 - our own probe file

say("\nALL DONE")
