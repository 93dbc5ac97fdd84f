"""Round-3: re-sweep the whole-scan kernel's batch-tile knob with the
sorted-hash match in place (the footprint changed) and with an explicit
scoped-VMEM limit — the r2 sweep stopped at block_b=24 because 32
OOMed under the DEFAULT 16 MB limit, but v5e carries 128 MB physical
(the traceback + TP kernels already budget past 16 MB successfully).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 \
    python scripts/tpu_r3_blockb_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


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
    from gasr_tpu.decoder.beam_search import _init_beam
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    T, B, V, W = 200, 256, 47, 100
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    init = pack_state(_init_beam(B, W, True))

    ref = None
    for bb in (24, 32, 64):
        try:
            out = fused_prefix_decode(lp, init, W=W, V=V,
                                      sel_mode="auto", block_b=bb)
            sync(out)
        except Exception as e:
            log(f"block_b={bb}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}")
            continue
        if ref is None:
            ref = out
        else:
            same = all(np.array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(out, f)))
                       for f in ref._fields)
            log(f"block_b={bb} bit-parity vs 24: {same}")
        t = timeit(lambda: fused_prefix_decode(
            lp, init, W=W, V=V, sel_mode="auto", block_b=bb))
        log(f"block_b={bb}: {t * 1e3:.1f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
