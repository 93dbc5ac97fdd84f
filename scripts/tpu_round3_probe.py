"""Round-3 TPU probes, one long-lived session (tunnel claims are slow).

1. tiny TP-fused kernel sanity (SMEM scalars, shard_map mesh of 1)
2. flag-mode whole-scan kernel vs r2 auto at the flagship shape
3. flagship decode e2e through ctc_beam_search (flag + exact fallback)
4. TP decode paths on a hardware mesh of 1: auto (whole-scan kernel)
   and forced fused per-frame (the n>1 program), timed

Run: timeout 1800 python scripts/tpu_round3_probe.py 2>&1 | tail -40
"""

import sys
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


def rand_lp(rng, T, B, V):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    return jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))


def main():
    from gasr_tpu.decoder.beam_search import (_init_beam, ctc_beam_search)
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  fused_tp_frame,
                                                  pack_state, tp_pack)
    from gasr_tpu.parallel import make_mesh
    from gasr_tpu.parallel.decode_tp import ctc_beam_search_tp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- 1. tiny TP kernel sanity (new SMEM-scalar program)
    T, B, V, W = 5, 8, 13, 8
    lp = rand_lp(rng, T, B, V)
    init = pack_state(_init_beam(B, W, True))
    f_t = lp[0]
    last = jnp.clip(init[4], 0, V - 1)
    f_last = jnp.take_along_axis(f_t, last, axis=1)
    f_blank = jnp.broadcast_to(f_t[:, 0:1], (B, 128))
    f_loc = jnp.pad(f_t, ((0, 0), (0, 128 - V)))
    lo_hi = jnp.array([0, V], jnp.int32)
    ys, sidx, fin = fused_tp_frame(f_loc, f_last, f_blank, init, lo_hi,
                                   W=W, V=V, blank_id=0,
                                   pack=tp_pack(V, 1, W))
    sync(fin)
    log(f"1. tiny TP kernel compiles+runs: ys[0,:4]={np.asarray(ys)[0, :4]}")

    # ---- 2. whole-scan kernel: flag vs auto at flagship
    T, B, V, W = 200, 256, 47, 100
    lp = rand_lp(rng, T, B, V)
    init = pack_state(_init_beam(B, W, True))
    for mode in ("auto", "flag"):
        t = timeit(lambda: fused_prefix_decode(lp, init, W=W, V=V,
                                               sel_mode=mode))
        log(f"2. whole-scan kernel sel_mode={mode}: {t * 1e3:.1f} ms")

    # ---- 3. decode e2e (flag + fallback dispatch)
    t = timeit(lambda: ctc_beam_search(lp, beam_width=W, max_len=256))
    log(f"3. flagship decode e2e (auto dispatch): {t * 1e3:.1f} ms")

    # parity spot-check vs matched on a slice (full matched decode at
    # flagship is ~2 ms/frame; use T=40 to keep the probe short)
    lp_s = lp[:40]
    a = ctc_beam_search(lp_s, beam_width=W, max_len=64,
                        merge_impl="pallas")
    b = ctc_beam_search(lp_s, beam_width=W, max_len=64,
                        merge_impl="matched")
    ok = (np.array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
          and np.array_equal(np.asarray(a.scores), np.asarray(b.scores)))
    log(f"3b. flag-path bit-parity vs matched (T=40): {ok}")
    if not ok:
        sys.exit("PARITY FAILURE")

    # ---- 4. TP decode on a hardware mesh of 1
    mesh = make_mesh({"model": 1})
    t = timeit(lambda: ctc_beam_search_tp(lp, beam_width=W, mesh=mesh,
                                          max_len=256))
    log(f"4a. TP decode n=1 auto (whole-scan kernel): {t * 1e3:.1f} ms")
    got = ctc_beam_search_tp(lp_s, beam_width=W, mesh=mesh, max_len=64,
                             tp_impl="fused_frame")
    ok = (np.array_equal(np.asarray(got.tokens), np.asarray(b.tokens))
          and np.array_equal(np.asarray(got.scores), np.asarray(b.scores)))
    log(f"4b. TP fused per-frame path bit-parity (T=40, mesh of 1): {ok}")
    t = timeit(lambda: ctc_beam_search_tp(lp, beam_width=W, mesh=mesh,
                                          max_len=256, tp_impl="fused_frame"),
               iters=3)
    log(f"4c. TP fused per-frame path (mesh of 1, incl. per-frame "
        f"kernel dispatch + degenerate all_gather): {t * 1e3:.1f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
