"""Pallas fused LSTM recurrence — W_hh resident in VMEM across steps.

Same design as rnn_scan.py for the LSTM cell: the input projection
x @ W_ih (+ biases) is one big XLA GEMM outside; the kernel runs the
time loop as a sequential grid carrying (h, c) in VMEM scratch with the
[H, 4H] recurrent weights (bf16) loaded once. Gate order i, f, g, o
(torch convention, ops/lstm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xw_ref, whh_ref, h0_ref, c0_ref, out_ref, h_scratch, c_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    h = h_scratch[:]
    c = c_scratch[:]
    H = h.shape[-1]
    pre = xw_ref[0] + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(pre[:, 1 * H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scratch[:] = h_new
    c_scratch[:] = c_new
    out_ref[0] = h_new


@functools.partial(jax.jit, static_argnames=("reverse", "interpret",
                                             "weight_dtype"))
def lstm_scan_pallas_raw(xw: jax.Array, w_hh: jax.Array, h0: jax.Array,
                         c0: jax.Array, reverse: bool = False,
                         interpret: bool = False,
                         weight_dtype=jnp.bfloat16) -> jax.Array:
    """xw: [T, B, 4H]; w_hh: [H, 4H]; h0/c0: [B, H] -> [T, B, H]."""
    T, B, H4 = xw.shape
    H = H4 // 4
    w = w_hh.astype(weight_dtype)
    t_map = (lambda t: (T - 1 - t, 0, 0)) if reverse else \
        (lambda t: (t, 0, 0))

    return pl.pallas_call(
        _kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), t_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H4,
            bytes_accessed=T * B * (H4 + H) * 4 + H * H4 * 2,
            transcendentals=5 * T * B * H,
        ),
    )(xw, w, h0, c0)


def _supported(B: int, H: int) -> bool:
    return H % 128 == 0 and B % 8 == 0


def lstm_scan_pallas(cell: dict, x: jax.Array, h0: jax.Array,
                     c0: jax.Array, reverse: bool = False,
                     weight_dtype=jnp.bfloat16) -> jax.Array:
    """Drop-in for ops.lstm._scan_one_direction."""
    T, B = x.shape[0], x.shape[1]
    H = cell["w_hh"].shape[0]
    xw = (jnp.dot(x, cell["w_ih"], preferred_element_type=jnp.float32)
          + cell["b_ih"] + cell["b_hh"])
    if not _supported(B, H):
        from gasr_tpu.ops.lstm import _scan_one_direction
        return _scan_one_direction(cell, x, h0, c0, reverse=reverse)
    interpret = jax.default_backend() != "tpu"
    return lstm_scan_pallas_raw(xw, cell["w_hh"], h0, c0, reverse=reverse,
                                interpret=interpret,
                                weight_dtype=weight_dtype)
