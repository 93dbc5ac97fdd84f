"""Round-3 follow-up: time the fused TP decode path on a hardware mesh
of 1 after the traceback vmem_limit fix (round3 probe item 4c OOMed:
Mosaic double-buffered the persistent traceback output blocks only in
the shard_map-inlined module, 24.3 MB > the default 16 MB limit).

Run: PYTHONPATH=/root/repo timeout 1800 python scripts/tpu_r3_tp_time.py
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
    from gasr_tpu.decoder.beam_search import ctc_beam_search
    from gasr_tpu.parallel import make_mesh
    from gasr_tpu.parallel.decode_tp import ctc_beam_search_tp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    T, B, V, W = 200, 256, 47, 100
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))

    mesh = make_mesh({"model": 1})
    got = ctc_beam_search_tp(lp[:40], beam_width=W, mesh=mesh,
                             max_len=64, tp_impl="fused")
    ref = ctc_beam_search(lp[:40], beam_width=W, max_len=64,
                          merge_impl="matched")
    ok = (np.array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
          and np.array_equal(np.asarray(got.scores),
                             np.asarray(ref.scores)))
    log(f"TP fused bit-parity (T=40): {ok}")

    t = timeit(lambda: ctc_beam_search_tp(lp, beam_width=W, mesh=mesh,
                                          max_len=256, tp_impl="fused"),
               iters=3)
    log(f"TP fused per-frame path e2e (mesh of 1, incl. per-frame "
        f"kernel dispatch + degenerate all_gather): {t * 1e3:.1f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
