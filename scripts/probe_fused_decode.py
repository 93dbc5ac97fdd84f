"""TPU Mosaic probes for the fused decode kernel's risky constructs.

Run standalone on the real TPU. Each probe compiles + runs a micro
kernel and prints PASS/FAIL with flushed output so a backend abort
still leaves a trail. Order: riskiest constructs first, full kernel
last."""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def say(*a):
    print(*a, flush=True)


def run(name, fn):
    say(f"--- probe: {name}")
    try:
        fn()
        say(f"PASS {name}")
    except Exception as e:
        say(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")
        sys.exit(1)


Bt, S = 8, 128


def probe_batched_dot():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    a = jnp.ones((Bt, S, S), jnp.float32)
    b = jnp.ones((Bt, S, S), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((Bt, S, S), jnp.float32))(a, b)
    assert float(out[0, 0, 0]) == S, float(out[0, 0, 0])


def probe_axis1_gather():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(Bt * 128, dtype=jnp.float32).reshape(Bt, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1),
                   axis=1)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((Bt, 128), jnp.float32))(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def probe_lane_broadcast_and_int_mul():
    def k(x_ref, o_ref):
        x = x_ref[:]                       # [Bt, S] int32
        col = jnp.sum(x, axis=1, keepdims=True)        # [Bt, 1]
        b = jnp.broadcast_to(col.reshape(Bt, 1), (Bt, S))
        o_ref[:] = x * np.int32(1000003) + b

    x = jnp.ones((Bt, S), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((Bt, S), jnp.int32))(x)
    assert int(out[0, 0]) == 1000003 + S


def probe_scratch_fields():
    NF = 9

    def k(x_ref, o_ref, st):
        st[...] = x_ref[...]
        st[2] = st[0] + st[1]
        o_ref[...] = st[...]

    x = jnp.ones((NF, Bt, S), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((NF, Bt, S), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NF, Bt, S), jnp.int32)])(x)
    assert int(out[2, 0, 0]) == 2


def probe_reshape_merge():
    C = 128

    def k(x_ref, o_ref):
        x3 = x_ref[:].reshape(Bt, C, 128)
        flat = x3.reshape(Bt * C, 128)
        o_ref[:] = flat

    x = jnp.arange(Bt * C * 128, dtype=jnp.float32).reshape(Bt, C * 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((Bt * C, 128), jnp.float32))(x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(Bt * C, 128))


def probe_full_kernel():
    from gasr_tpu.decoder.beam_search import ctc_beam_search
    rng = np.random.default_rng(0)
    T, B, V, W = 6, 8, 47, 100
    x = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    lp = x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                          max_len=16)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched",
                          max_len=16)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))
    say("tokens/lengths bit-equal on TPU")
    sd = float(jnp.max(jnp.abs(jnp.where(
        got.scores < -1e29, 0.0, got.scores - ref.scores))))
    say(f"max live score delta: {sd}")
    assert sd < 1e-4, sd


if __name__ == "__main__":
    say("devices:", jax.devices())
    run("batched_dot3d", probe_batched_dot)
    run("axis1_gather", probe_axis1_gather)
    run("lane_broadcast_int_mul", probe_lane_broadcast_and_int_mul)
    run("scratch_fields", probe_scratch_fields)
    run("reshape_merge", probe_reshape_merge)
    run("full_fused_decode", probe_full_kernel)
    say("ALL PROBES PASS")
