"""r5 small-preset decode audit (VERDICT r4 weak #5 / ask #6): where do
bilstm (B=16 W=10 V=29, decode 13.6 ms) and conformer_l (B=64 W=16
V=129, 31.4 ms) decodes spend their time at shapes far below the
flagship's?

Measures, per preset shape:
  - the dispatched decode path (whatever _use_pallas picks)
  - forced XLA matched-merge vs forced fused kernel
  - fused-kernel knob sweep: pack in {0,1,2,4}, block_b in {8,16,32},
    sel_mode in {auto, exact}
  - a T-scaling row (half frames) to split per-frame cost from fixed
    dispatch/launch overhead

Run: timeout 3600 python scripts/tpu_r5_small_preset_probe.py
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


def bench(fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


say("devices:", jax.devices())

from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import _init_beam, _pallas_scan
from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                              pack_state)

SHAPES = [
    ("bilstm", 400, 16, 29, 10, 256),      # (name, T, B, V, W, L)
    ("conformer_l", 300, 64, 129, 16, 256),
]

for name, T, B, V, W, L in SHAPES:
    say(f"\n=== {name}: T={T} B={B} V={V} W={W} ===")
    rng = np.random.default_rng(0)
    xx = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(xx - np.log(np.exp(xx).sum(-1, keepdims=True)))
    sync(lp)

    dec_auto = jax.jit(lambda l: ctc_beam_search(
        l, beam_width=W, max_len=L).tokens)
    dec_xla = jax.jit(lambda l: ctc_beam_search(
        l, beam_width=W, max_len=L, merge_impl="matched").tokens)
    dec_pl = jax.jit(lambda l: ctc_beam_search(
        l, beam_width=W, max_len=L, merge_impl="pallas").tokens)
    say(f"auto dispatch : {bench(dec_auto, lp)*1e3:8.2f} ms")
    say(f"xla matched   : {bench(dec_xla, lp)*1e3:8.2f} ms")
    say(f"pallas        : {bench(dec_pl, lp)*1e3:8.2f} ms")
    say(f"pallas T/2    : {bench(dec_pl, lp[:T//2])*1e3:8.2f} ms"
        f"  (fixed overhead = 2*half - full)")

    # kernel-only knob sweep (no traceback): isolates the scan kernel
    init = pack_state(_init_beam(B, W, True))
    sync(init)
    for pack in (0, 1, 2, 4):
        for block_b in (8, 16, 32):
            if block_b > B:
                continue
            try:
                k = jax.jit(functools.partial(
                    fused_prefix_decode, W=W, V=V, blank_id=0,
                    pack=pack, block_b=block_b, sel_mode="auto"))
                t = bench(lambda l: k(l, init).ys, lp, iters=20)
                say(f"kernel pack={pack} block_b={block_b:2d}: "
                    f"{t*1e3:8.2f} ms")
            except Exception as e:   # noqa: BLE001
                say(f"kernel pack={pack} block_b={block_b:2d}: FAILED "
                    f"{str(e)[:120]}")
    try:
        k = jax.jit(functools.partial(
            fused_prefix_decode, W=W, V=V, blank_id=0,
            sel_mode="exact"))
        t = bench(lambda l: k(l, init).ys, lp, iters=20)
        say(f"kernel sel_mode=exact (defaults): {t*1e3:8.2f} ms")
    except Exception as e:           # noqa: BLE001
        say(f"kernel sel_mode=exact: FAILED {str(e)[:120]}")

say("\nALL DONE")
