"""Localize the TPU-only LM mismatch: sweep shapes/packs, compare the
fused kernel's packed ys stream against the XLA matched path frame by
frame, and dump the first divergence."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def say(*a):
    print(*a, flush=True)


say("devices:", jax.devices())

from gasr_tpu.decoder.beam_search import (_init_beam, _pick_step,
                                          ctc_beam_search)
from gasr_tpu.ops.pallas.fused_decode import fused_prefix_decode, pack_state
from jax import lax


def run(B, T, V, W, pack, seed=0):
    rng = np.random.default_rng(seed)
    lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
    lm = jnp.asarray(rng.standard_normal((V + 1, V)).astype(np.float32))
    lmq = lm.astype(jnp.bfloat16).astype(jnp.float32) + 0.0

    init = _init_beam(B, W, True)
    out = fused_prefix_decode(lp, pack_state(init), W=W, V=V,
                              pack=pack, lm_q=lmq)
    ys_k = np.asarray(out.ys)

    step = _pick_step(B, W, V, 0, "prefix", True, "matched",
                      lm_bias=lmq)
    is_last = jnp.zeros((T,), jnp.bool_)
    _, ys_x = lax.scan(step, init, (lp, is_last))
    ys_x = np.asarray(ys_x)

    if np.array_equal(ys_k, ys_x):
        say(f"B={B} T={T} V={V} W={W} pack={pack}: MATCH")
        return True
    t_bad = int(np.argmax((ys_k != ys_x).any(axis=(1, 2))))
    nbad = int((ys_k[t_bad] != ys_x[t_bad]).sum())
    b, w = map(int, np.argwhere(ys_k[t_bad] != ys_x[t_bad])[0])
    say(f"B={B} T={T} V={V} W={W} pack={pack}: FIRST DIFF frame {t_bad}"
        f" ({nbad} cells), e.g. b={b} w={w}:"
        f" kernel={ys_k[t_bad, b, w]:#x} xla={ys_x[t_bad, b, w]:#x}")
    pk, px = ys_k[t_bad, b, w], ys_x[t_bad, b, w]
    say(f"  kernel parent={pk & 0x7FFF} char={(pk >> 15) & 0x7FFF} "
        f"app={(pk >> 30) & 1}")
    say(f"  xla    parent={px & 0x7FFF} char={(px >> 15) & 0x7FFF} "
        f"app={(px >> 30) & 1}")
    return False


run(2, 10, 5, 6, 1, seed=1)
run(2, 8, 23, 20, 2, seed=2)
run(4, 12, 47, 100, 2, seed=3)
run(4, 12, 47, 100, 1, seed=3)
say("ALL DONE")

# full flagship ys-level localization (appended pass 2)
run(256, 200, 47, 100, 2, seed=0)
run(256, 200, 47, 100, 1, seed=0)
