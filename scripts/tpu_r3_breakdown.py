"""Round-3: (1) current whole-scan kernel numbers (flag vs auto) after
the branch-free flag-mode landing; (2) decode e2e; (3) the per-frame TP
path's launch floor — a lax.scan whose body is ONLY the fused_tp_frame
pallas_call on carried state (no glue, no sort, no all_gather) — to
show where the 718 ms goes and justify the whole-scan TP kernel.

Run: PYTHONPATH=/root/repo timeout 1800 python scripts/tpu_r3_breakdown.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(msg):
    print(f"[probe] {msg}", flush=True)


def sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, iters=5):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    from gasr_tpu.decoder.beam_search import _init_beam, ctc_beam_search
    from gasr_tpu.ops.pallas.fused_decode import (
        fused_prefix_decode, fused_tp_frame, pack_state, tp_pack)

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    T, B, V, W = 200, 256, 47, 100
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    init = pack_state(_init_beam(B, W, True))

    # 1. whole-scan kernel: flag vs auto
    for mode in ("auto", "flag"):
        t = timeit(lambda: fused_prefix_decode(lp, init, W=W, V=V,
                                               sel_mode=mode))
        log(f"whole-scan kernel sel_mode={mode}: {t * 1e3:.1f} ms")

    # 2. decode e2e (dispatcher default)
    t = timeit(lambda: ctc_beam_search(lp, beam_width=W, max_len=256))
    log(f"decode e2e (auto dispatch): {t * 1e3:.1f} ms")

    # 3. per-frame TP kernel launch floor: scan body = pallas_call only
    pack = tp_pack(V, 1, W)
    lo_hi = jnp.array([0, V], jnp.int32)
    f0 = jnp.pad(lp[0], ((0, 0), (0, 128 - V)))
    f_last0 = jnp.zeros((B, 128), jnp.float32)
    f_blank0 = jnp.broadcast_to(lp[0][:, 0:1], (B, 128))

    @jax.jit
    def kernel_only_scan(f0, f_last0, f_blank0, st0):
        def body(st, _):
            ys, sidx, fin = fused_tp_frame(
                f0, f_last0, f_blank0, st, lo_hi, W=W, V=V,
                blank_id=0, pack=pack)
            return fin, ys[:, 0]
        fin, yss = lax.scan(body, st0, None, length=T)
        return fin, yss

    t = timeit(lambda: kernel_only_scan(f0, f_last0, f_blank0, init),
               iters=3)
    log(f"per-frame TP kernel-only scan (T={T}, no glue/sort/gather): "
        f"{t * 1e3:.1f} ms  ({t / T * 1e6:.0f} us/frame)")
    log("DONE")


if __name__ == "__main__":
    main()
