"""Round-3: time the sorted-hash parent match vs the compare-grid
match inside the whole-scan fused decode kernel at the flagship shape
(the r2 stage profile put the grid match at 12.3 ms / 200 frames).
Both impls are bit-equal (tests/test_pallas_decode.py::
test_match_impl_sorted); this probe decides the default.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 \
    python scripts/tpu_r3_match_probe.py
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

    outs = {}
    for mi in ("grid", "sorted"):
        out = fused_prefix_decode(lp, init, W=W, V=V, sel_mode="auto",
                                  match_impl=mi)
        sync(out)
        outs[mi] = out
        t = timeit(lambda: fused_prefix_decode(
            lp, init, W=W, V=V, sel_mode="auto", match_impl=mi))
        log(f"whole-scan kernel match_impl={mi}: {t * 1e3:.1f} ms")
    same = all(
        np.array_equal(np.asarray(getattr(outs["grid"], f)),
                       np.asarray(getattr(outs["sorted"], f)))
        for f in outs["grid"]._fields)
    log(f"bit-parity grid == sorted on hardware: {same}")
    log("DONE")


if __name__ == "__main__":
    main()
