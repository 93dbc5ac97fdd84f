"""TPU probe: pack-2 fused decode kernel — exactness vs pack-1, timing.

Flagship shape. Run standalone (fresh session); flushed prints so a
Mosaic abort leaves a trail.
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

from gasr_tpu.decoder.beam_search import _init_beam, ctc_beam_search
from gasr_tpu.ops.pallas.fused_decode import fused_prefix_decode, pack_state

B, T, V, W = 256, 200, 47, 100
rng = np.random.default_rng(0)
lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
init = pack_state(_init_beam(B, W, True))

say("--- compile + run pack=2 (small T first)")
o2s = fused_prefix_decode(lp[:8], init, W=W, V=V, pack=2)
sync(o2s)
say("pack=2 compiles and runs at T=8")

say("--- exactness pack=2 vs pack=1, full T")
o1 = fused_prefix_decode(lp, init, W=W, V=V, pack=1)
o2 = fused_prefix_decode(lp, init, W=W, V=V, pack=2)
sync(o1)
sync(o2)
ok = True
for name, a, b in zip(o1._fields, o1, o2):
    same = np.array_equal(np.asarray(a), np.asarray(b))
    if not same:
        ok = False
        say(f"MISMATCH field {name}")
say(f"bit-exact pack2 vs pack1: {ok}")
assert ok

f1 = jax.jit(lambda p: fused_prefix_decode(p, init, W=W, V=V, pack=1))
bench("scan kernel pack=1 block_b=16 tblk=1", f1, lp)
f2 = jax.jit(lambda p: fused_prefix_decode(p, init, W=W, V=V, pack=2))
bench("scan kernel pack=2 block_b=16 tblk=1", f2, lp)
# NOTE: block_b=32 OOMs scoped VMEM (probed r2); 16 is the ceiling.

say("--- e2e decode (auto dispatch now pack=2)")
fused = jax.jit(lambda p: ctc_beam_search(p, beam_width=W,
                                          merge_impl="pallas", max_len=256))
bench("decode e2e pack-auto L=256", fused, lp)

say("--- tie-heavy exactness on hardware (quantized logits, W=16)")
lpq = jnp.asarray(
    (np.round(rng.standard_normal((20, 8, 30)) * 2) / 2).astype(np.float32))
lpq = lpq - jax.scipy.special.logsumexp(lpq, axis=-1, keepdims=True)
r_ref = ctc_beam_search(lpq, beam_width=16, merge_impl="matched",
                        max_len=24)
r_got = ctc_beam_search(lpq, beam_width=16, merge_impl="pallas",
                        max_len=24)
sync(r_got)
ok = (np.array_equal(np.asarray(r_ref.tokens), np.asarray(r_got.tokens))
      and np.array_equal(np.asarray(r_ref.scores), np.asarray(r_got.scores)))
say(f"tie-heavy hardware parity vs matched: {ok}")
assert ok
say("ALL DONE")
