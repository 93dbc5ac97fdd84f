"""r5 hardware probe, one TPU claim, three sections:

A. conformer_l / conformer_s bf16 TRAINING step through the flash-MHSA
   custom_vjp (VERDICT r4 #1: this path did not exist before r5 —
   jax.grad through the kernel crashed).
B. Flagship (deepspeech B=256 T=200 H=2048) train-step STAGE BREAKDOWN:
   fwd / +CTC / +bwd / +optimizer (VERDICT r4 #4: 37% MFU vs 51% fwd
   with no attribution).
C. Streaming decode STAGE PROFILE at the flagship shape: chunk kernels
   -> +traceback -> +base gather -> +overlay selects -> full
   streaming_step (VERDICT r4 #3: 1.21x batch, floor says >=10 ms
   recoverable).

Run: timeout 3600 python scripts/tpu_r5_probe.py [A|B|C ...] (default all)
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


def timeit(fn, *args, iters=10, warm=True, **kw):
    if warm:
        sync(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())
sections = set(sys.argv[1:]) or {"A", "B", "C"}

from gasr_tpu.config import PRESETS, Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.ops.ctc_loss import ctc_loss
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch

# ---------------------------------------------------------------- A
if "A" in sections:
    for preset in ("conformer_s", "conformer_l"):
        cfg = PRESETS[preset]
        import dataclasses
        cfg = dataclasses.replace(cfg, mesh_shape={})
        say(f"\n=== A: {preset} bf16 train (B={cfg.batch_size} "
            f"T={cfg.seg_len}) ===")
        opt = make_optimizer()
        batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
        sync(batch)
        # forward first (regression check vs r4 78.3 ms for _l)
        params = model_init(cfg, jax.random.PRNGKey(0))
        fwd = jax.jit(lambda p, x: model_apply(
            cfg, p, x, compute_dtype=jnp.bfloat16))
        say("compiling fwd ...")
        t = timeit(fwd, params, batch["inputs"], iters=5)
        say(f"{preset} fwd bf16(flash): {t*1e3:8.2f} ms")
        for name, kw in [("bf16", {"compute_dtype": jnp.bfloat16}),
                         ("bf16+remat", {"compute_dtype": jnp.bfloat16,
                                         "remat": True})]:
            params = model_init(cfg, jax.random.PRNGKey(0))
            opt_state = opt.init(params)
            step = jax.jit(make_train_step(cfg, opt, **kw),
                           donate_argnums=(0, 1))
            say(f"compiling train {name} ...")
            try:
                params, opt_state, m = step(params, opt_state, batch)
                sync(m)
            except Exception as e:       # noqa: BLE001
                say(f"train {name} FAILED: {str(e)[:300]}")
                continue
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                params, opt_state, m = step(params, opt_state, batch)
            sync(m)
            dt = (time.perf_counter() - t0) / iters
            say(f"{preset} train {name:10s}: {dt*1e3:8.2f} ms/step "
                f"loss={float(m['loss']):.3f}")

# ---------------------------------------------------------------- B
if "B" in sections:
    say("\n=== B: flagship train stage breakdown ===")
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
    opt_state = opt.init(params)
    full = jax.jit(make_train_step(cfg, opt))

    say("compiling 4 stages ...")
    t_f = timeit(fwd_only, params, batch, iters=10)
    t_fc = timeit(fwd_ctc, params, batch, iters=10)
    t_g = timeit(vag, params, batch, iters=10)
    t_s = timeit(full, params, opt_state, batch, iters=10)
    say(f"fwd only        : {t_f*1e3:8.2f} ms")
    say(f"fwd+ctc         : {t_fc*1e3:8.2f} ms   (ctc ~ "
        f"{(t_fc-t_f)*1e3:.2f})")
    say(f"value_and_grad  : {t_g*1e3:8.2f} ms   (bwd ~ "
        f"{(t_g-t_fc)*1e3:.2f})")
    say(f"full step       : {t_s*1e3:8.2f} ms   (optimizer ~ "
        f"{(t_s-t_g)*1e3:.2f})")

# ---------------------------------------------------------------- C
if "C" in sections:
    say("\n=== C: streaming stage profile (flagship) ===")
    from gasr_tpu.decoder.beam_search import (_init_beam, _pallas_scan,
                                              streaming_init,
                                              streaming_step)
    from gasr_tpu.ops.pallas.fused_decode import traceback_pallas

    T, B, V, W, Tc, L = 200, 256, 47, 100, 20, 256
    n_chunks = T // Tc
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    sync(lp)

    dec = jax.jit(functools.partial(_pallas_scan, W=W, V=V, blank_id=0))

    @jax.jit
    def st_kernel(beam, chunk):
        final, ys = dec(chunk, beam)
        return final, ys[-1, :, :1].sum()

    @jax.jit
    def st_tb(beam, chunk):
        final, ys = dec(chunk, beam)
        k_tok, k_rel, sp = traceback_pallas(
            ys, jnp.full_like(final.length, Tc), Tc, interpret=False)
        return final, k_tok[:, :1, :1].sum()

    @jax.jit
    def st_gather(beam, chunk, tok, ts):
        final, ys = dec(chunk, beam)
        k_tok, k_rel, sp = traceback_pallas(
            ys, jnp.full_like(final.length, Tc), Tc, interpret=False)
        sp3 = sp[:, :, None]
        tokens = jnp.take_along_axis(tok, sp3, axis=1)
        tsteps = jnp.take_along_axis(ts, sp3, axis=1)
        return final, tokens, tsteps

    @jax.jit
    def st_overlay(beam, chunk, tok, ts, frames):
        final, ys = dec(chunk, beam)
        k_tok, k_rel, sp = traceback_pallas(
            ys, jnp.full_like(final.length, Tc), Tc, interpret=False)
        sp3 = sp[:, :, None]
        tokens = jnp.take_along_axis(tok, sp3, axis=1)
        tsteps = jnp.take_along_axis(ts, sp3, axis=1)
        off = (final.length - Tc)[:, :, None]
        idxL = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        for j in range(Tc):
            pos_j = off + j
            tok_j = k_tok[:, :, j:j + 1]
            t_j = k_rel[:, :, j:j + 1]
            hit = (idxL == pos_j) & (tok_j >= 0)
            tokens = jnp.where(hit, tok_j, tokens)
            tsteps = jnp.where(hit, t_j + frames, tsteps)
        return final, tokens, tsteps

    init = _init_beam(B, W, True)
    tok0 = jnp.full((B, W, L), -1, jnp.int32)

    def run_kernel():
        beam, s = init, None
        for c in range(n_chunks):
            beam, s = st_kernel(beam, lp[c * Tc:(c + 1) * Tc])
        return s

    def run_tb():
        beam, s = init, None
        for c in range(n_chunks):
            beam, s = st_tb(beam, lp[c * Tc:(c + 1) * Tc])
        return s

    def run_gather():
        beam, tok, ts = init, tok0, tok0
        for c in range(n_chunks):
            beam, tok, ts = st_gather(beam, lp[c * Tc:(c + 1) * Tc],
                                      tok, ts)
        return tok

    def run_overlay():
        beam, tok, ts = init, tok0, tok0
        for c in range(n_chunks):
            beam, tok, ts = st_overlay(beam, lp[c * Tc:(c + 1) * Tc],
                                       tok, ts,
                                       jnp.asarray(c * Tc, jnp.int32))
        return tok

    def run_full():
        st = streaming_init(B, W, max_len=L)
        res = None
        for c in range(n_chunks):
            st, res = streaming_step(st, lp[c * Tc:(c + 1) * Tc])
        return res.tokens

    say("compiling 5 streaming variants ...")
    for name, fn in [("chunks only (kernels)", run_kernel),
                     ("+ traceback", run_tb),
                     ("+ base gather", run_gather),
                     ("+ overlay selects", run_overlay),
                     ("full streaming_step", run_full)]:
        t = timeit(fn, iters=10)
        say(f"{name:24s}: {t*1e3:8.2f} ms")

    # batch decode reference
    from gasr_tpu.decoder import ctc_beam_search
    bd = jax.jit(lambda l: ctc_beam_search(l, beam_width=W, max_len=L))
    t = timeit(lambda: bd(lp), iters=10)
    say(f"{'batch decode':24s}: {t*1e3:8.2f} ms")

say("\nALL DONE")
