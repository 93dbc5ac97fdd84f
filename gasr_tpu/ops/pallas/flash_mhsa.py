"""Fused rel-pos MHSA Pallas kernel (flash-style: no O(T^2) HBM tensor).

Why: the XLA mhsa_rel path materializes, PER BLOCK, a [B, H, T, 2T-1]
position-score tensor (734 MB f32 at conformer_l's post-subsample
shape), rel-shifts it via pad+reshape passes, then re-streams the
[B, H, T, T] scores through softmax — measured ~7 ms of pure HBM
traffic per block on TPU v5e (scripts/tpu_r4_conformer_profile.py:
ac +1.4, bd+shift +3.2, softmax +1.9, attn@V +0.6 ms over the
dispatch floor), 17x per model = the bulk of the 172 ms bf16 forward.

Here every (batch, head) computes its full [T_pad, T_pad] score tile
in VMEM: content scores (q+u)@k^T and position scores (q+v)@r^T ride
the MXU at bf16 with f32 accumulation, the Transformer-XL rel-shift
becomes a same-shape axis-1 dynamic_gather (tpu.dynamic_gather IS
Mosaic-lowerable — CLAUDE.md op-support notes; the pad+reshape trick
XLA uses is unnecessary in VMEM), softmax runs in f32 on the VPU, and
only the [T, dh] per-head output is written back. T' = ceil(T/4) after
conformer subsampling, so a whole utterance's tile fits VMEM for
T' <= ~1024 (the dispatcher's eligibility bound; longer sequences fall
back to the XLA path).

Grid: (B,) — one program per batch row, static 8-way head loop inside
(a (B*H, qtile) grid would pay ~1.5 us/program x 1536 programs of
fixed cost for no VMEM benefit at these shapes).

No reference counterpart (the reference has no attention); this is the
"beyond-reference" model family SURVEY.md §2.3 reserves.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(len_ref, q_ref, k_ref, v_ref, r_ref, u_ref, vb_ref, o_ref,
            *, H: int, T: int, Tp: int, Lp: int, dh: int, out_f32: bool):
    """One batch row: loop heads, full-tile attention in VMEM.

    q/k/v/o: [1, H, Tp, dh] (bf16 in, out_f32 selects o dtype)
    r: [H, Lp, dh] rel-pos projections (row l = offset (T-1-l))
    u/vb: [H, 1, dh] content/position biases
    len: [B] SMEM (full array; rank-1 blocks must cover the array) —
    valid key length per row (<= T), indexed by program id
    """
    len_b = len_ref[pl.program_id(0)]
    scale = np.float32(1.0 / math.sqrt(dh))
    # lane iota over key positions, sublane iota over query positions
    j_lane = lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    valid = j_lane < len_b
    # rel-shift gather index: col c of the position row holds offset
    # (T-1-c), and score (i, j) needs offset (i-j) -> c = T-1-i+j
    # (built from two full-shape iotas — no lane slicing, which does
    # not lower)
    gidx = jnp.clip(
        np.int32(T - 1)
        - lax.broadcasted_iota(jnp.int32, (Tp, Lp), 0)
        + lax.broadcasted_iota(jnp.int32, (Tp, Lp), 1),
        0, np.int32(Lp - 1))

    for h in range(H):
        qh = q_ref[0, h]                       # [Tp, dh] bf16
        kh = k_ref[0, h]
        vh = v_ref[0, h]
        rh = r_ref[h]                          # [Lp, dh]
        qu = qh + u_ref[h]                     # broadcast [1, dh]
        qv = qh + vb_ref[h]
        ac = lax.dot_general(qu, kh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        bdf = lax.dot_general(qv, rh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        bd = jnp.take_along_axis(bdf, gidx, axis=1)[:, :Tp]
        scores = (ac + bd) * scale
        scores = jnp.where(valid, scores, NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        attn = (e / s).astype(jnp.bfloat16)
        out = lax.dot_general(attn, vh, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_f32", "interpret"))
def flash_mhsa_rel(q: jax.Array, k: jax.Array, v: jax.Array,
                   r: jax.Array, u: jax.Array, vb: jax.Array,
                   lengths: jax.Array,
                   out_f32: bool = False,
                   interpret: bool = False) -> jax.Array:
    """q/k/v: [B, H, T, dh] (any float dtype; cast to bf16 inside),
    r: [H, 2T-1, dh], u/vb: [H, dh], lengths: [B] int32 valid key
    counts (pass jnp.full((B,), T) for unmasked). Returns [B, H, T, dh]
    (f32 when out_f32 else bf16).
    """
    B, H, T, dh = q.shape
    L = r.shape[1]
    assert L == 2 * T - 1 and u.shape == (H, dh) and vb.shape == (H, dh)
    Tp = _round_up(T, 128)
    Lp = _round_up(L, 128)
    bf = jnp.bfloat16

    def padt(x, n):
        return jnp.pad(x.astype(bf), ((0, 0),) * (x.ndim - 2)
                       + ((0, n - x.shape[-2]), (0, 0)))

    qp, kp, vp = padt(q, Tp), padt(k, Tp), padt(v, Tp)
    rp = padt(r, Lp)
    u3 = u.astype(bf)[:, None, :]
    vb3 = vb.astype(bf)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, T=T, Tp=Tp, Lp=Lp, dh=dh,
                          out_f32=out_f32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, Tp, dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tp, dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tp, dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Lp, dh), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1, dh), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1, dh), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Tp, dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, H, Tp, dh), jnp.float32 if out_f32 else bf),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qp, kp, vp, rp, u3, vb3)
    return out[:, :, :T]


def flash_eligible(T: int, dh: int) -> bool:
    """VMEM budget: per-head tiles [Tp, Tp] f32 + [Tp, Lp] f32 x ~3
    must fit alongside the [1, H, Tp, dh] blocks; T <= 1024 keeps the
    transient set under ~30 MB."""
    return T <= 1024 and dh <= 128 and T >= 2
