"""Pallas fused RNN recurrence — W_hh resident in VMEM across timesteps.

The recurrence h_t = tanh(xw_t + h_{t-1} @ W_hh) is HBM-bandwidth-bound
when compiled as a `lax.scan`: XLA re-streams W_hh (H*H*4 bytes — 16 MB
at H=2048) from HBM every timestep. This kernel instead runs the whole
time loop as a sequential Pallas grid with W_hh and the carried h living
in VMEM scratch for the entire sequence; per step only the xw_t block
(B*H*4 bytes) moves, an ~5x cut in HBM traffic for the flagship shape
(B=256, H=2048, W_hh held bf16).

Structure (see /opt/skills/guides/pallas_guide.md):
  - grid = (T,); TPU grid iterations are sequential, so VMEM scratch
    carries state across timesteps.
  - xw (the hoisted input projection + biases, computed by one big XLA
    GEMM outside) is blocked (1, B, H) per grid step; the output block
    writes the same shape.
  - W_hh is passed once (full-array BlockSpec with constant index_map ->
    fetched into VMEM once, not per step) in bf16; the [B,H]x[H,H]
    MXU dot accumulates in f32.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xw_ref, whh_ref, h0_ref, out_ref, h_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:]
    pre = xw_ref[0] + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32)
    h_new = jnp.tanh(pre)
    h_scratch[:] = h_new
    out_ref[0] = h_new


@functools.partial(jax.jit, static_argnames=("reverse", "interpret",
                                             "weight_dtype"))
def rnn_scan_pallas_raw(xw: jax.Array, w_hh: jax.Array, h0: jax.Array,
                        reverse: bool = False, interpret: bool = False,
                        weight_dtype=jnp.bfloat16) -> jax.Array:
    """xw: [T, B, H] pre-computed input projection (+biases);
    w_hh: [H, H]; h0: [B, H]. Returns hidden history [T, B, H]."""
    T, B, H = xw.shape
    w = w_hh.astype(weight_dtype)

    t_map = (lambda t: (T - 1 - t, 0, 0)) if reverse else \
        (lambda t: (t, 0, 0))

    # VMEM: W_hh (possibly double-buffered despite the constant
    # index_map) + double-buffered xw/out blocks + h0 + h scratch.
    # The default 16 MB scoped budget rejects H=2048 (8 MB bf16 weights
    # alone, 16 MB f32); size the limit from the shapes instead —
    # v5e has 128 MB of physical VMEM.
    wbytes = H * H * jnp.dtype(weight_dtype).itemsize
    vmem_budget = min(110 * 2**20,
                      2 * wbytes + 6 * B * H * 4 + 4 * 2**20)
    out = pl.pallas_call(
        _kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), t_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_budget)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H,
            bytes_accessed=T * B * H * 4 * 2 + H * H * 2,
            transcendentals=T * B * H,
        ),
    )(xw, w, h0)
    return out


def _supported(B: int, H: int) -> bool:
    return H % 128 == 0 and B % 8 == 0


def rnn_scan_pallas(cell: dict, x: jax.Array, h0: jax.Array,
                    reverse: bool = False,
                    weight_dtype=jnp.bfloat16) -> jax.Array:
    """Drop-in for ops.rnn._scan_one_direction.

    x: [T, B, in] raw layer input; the input projection is one big XLA
    GEMM (MXU-optimal), the recurrence runs in the Pallas kernel.
    """
    T, B = x.shape[0], x.shape[1]
    H = cell["w_hh"].shape[0]
    xw = (jnp.dot(x, cell["w_ih"], preferred_element_type=jnp.float32)
          + cell["b_ih"] + cell["b_hh"])
    if not _supported(B, H):
        # shape not tileable: fall back to the XLA scan
        from gasr_tpu.ops.rnn import _scan_one_direction
        return _scan_one_direction(cell, x, h0, reverse=reverse)
    interpret = jax.default_backend() != "tpu"
    return rnn_scan_pallas_raw(xw, cell["w_hh"], h0, reverse=reverse,
                               interpret=interpret,
                               weight_dtype=weight_dtype)
