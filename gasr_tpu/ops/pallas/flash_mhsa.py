"""Fused rel-pos MHSA Pallas kernel (flash-style: no O(T^2) HBM tensor).

Why: the XLA mhsa_rel path materializes, PER BLOCK, a [B, H, T, 2T-1]
position-score tensor (734 MB f32 at conformer_l's post-subsample
shape), rel-shifts it via pad+reshape passes, then re-streams the
[B, H, T, T] scores through softmax — measured ~7 ms of pure HBM
traffic per block on TPU v5e (scripts/tpu_r4_conformer_profile.py:
ac +1.4, bd+shift +3.2, softmax +1.9, attn@V +0.6 ms over the
dispatch floor), 17x per model = the bulk of the 172 ms bf16 forward.

Here every (batch, head) computes its full [T_pad, T_pad] score tile
in VMEM and only the [T, dh] per-head outputs ever touch HBM.

The Transformer-XL rel-shift is GONE, not gathered: Mosaic's
dynamic_gather cannot cross 128-lane vreg boundaries along the gather
dimension (probed on hardware: lane-dim gather raises "Multiple source
vregs along gather dimension"; sublane-dim gather crashes the compile
helper), so instead the sinusoidal position bias is FACTORIZED by the
angle-addition identities:

    bd[s, t] = sum_i  u_i(t) sin(w_i (t-s)) + u'_i(t) cos(w_i (t-s))
             = cos(w s) . A(t) + sin(w s) . B(t)
      A(t) = u(t) sin(w t) + u'(t) cos(w t)
      B(t) = u'(t) sin(w t) - u(t) cos(w t)

with u(t) = wr_h^T (q_t + v) the per-head projection of the query onto
the sinusoid basis. Every term is an elementwise multiply or a plain
MXU matmul against precomputed per-position sin/cos tables — exactly
the kind of op Mosaic lowers well — and the math is EXACT (the same
sum XLA's gather computes, reassociated; differences are f32 rounding).

Scores live transposed as [key, query] so softmax is a sublane
reduction and attn @ V contracts sublanes — no transpose op anywhere.

Grid: (B,) — one program per batch row, static head loop inside
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


def _kernel(len_ref, q_ref, k_ref, v_ref, ws_ref, wc_ref, cs_ref, sn_ref,
            u_ref, vb_ref, o_ref,
            *, H: int, T: int, Tp: int, dh: int):
    """One batch row: loop heads, full-tile attention in VMEM.

    q/k/v/o: [1, H, Tp, dh] bf16 (o dtype = out_shape dtype)
    ws/wc: [H, dh, Dp2] — wr rows for the sin / cos halves of the
        sinusoid basis, per head (u(t) = qv @ ws, u'(t) = qv @ wc)
    cs/sn: [Tp, Dp2] — cos(w_i t), sin(w_i t) position tables
        (zero-padded past D/2 columns so padding contributes nothing)
    u/vb: [H, 1, dh] content/position biases
    len: [B] SMEM (full array; rank-1 blocks must cover the array) —
    valid key length per row (<= T), indexed by program id
    """
    len_b = len_ref[pl.program_id(0)]
    scale = np.float32(1.0 / math.sqrt(dh))
    # sublane iota over KEY positions, lane iota over QUERY positions
    s_sub = lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    valid = s_sub < len_b
    cs = cs_ref[...]
    sn = sn_ref[...]

    for h in range(H):
        qh = q_ref[0, h]                       # [Tp, dh] bf16
        kh = k_ref[0, h]
        vh = v_ref[0, h]
        qu = qh + u_ref[h]                     # broadcast [1, dh]
        qv = qh + vb_ref[h]
        # [key, query] content scores: k @ (q+u)^T
        acT = lax.dot_general(kh, qu, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        # factorized position scores (see module docstring)
        us = lax.dot_general(qv, ws_ref[h], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
        uc = lax.dot_general(qv, wc_ref[h], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
        A = us * sn + uc * cs                  # [Tp, Dp2] bf16
        Bm = uc * sn - us * cs
        bdT = (lax.dot_general(cs, A, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
               + lax.dot_general(sn, Bm, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))
        scores = (acT + bdT) * scale           # [key, query]
        scores = jnp.where(valid, scores, NEG)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        attn = (e / s).astype(jnp.bfloat16)    # [key, query]
        # out[t, d] = sum_s attn[s, t] * v[s, d]
        out = lax.dot_general(attn, vh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)


def _flash_fwd_impl(out_f32: bool, interpret: bool,
                    q: jax.Array, k: jax.Array, v: jax.Array,
                    wr: jax.Array, u: jax.Array, vb: jax.Array,
                    lengths: jax.Array) -> jax.Array:
    """The pallas_call forward (see flash_mhsa_rel for the contract)."""
    B, H, T, dh = q.shape
    D = H * dh
    assert wr.shape == (D, D) and u.shape == (H, dh) and vb.shape == (H, dh)
    half = D // 2
    Tp = _round_up(T, 128)
    Dp2 = _round_up(half, 128)
    bf = jnp.bfloat16

    def padt(x, n):
        return jnp.pad(x.astype(bf), ((0, 0),) * (x.ndim - 2)
                       + ((0, n - x.shape[-2]), (0, 0)))

    qp, kp, vp = padt(q, Tp), padt(k, Tp), padt(v, Tp)
    u3 = u.astype(bf)[:, None, :]
    vb3 = vb.astype(bf)[:, None, :]

    # wr rows 0..half-1 weight the sin block of the sinusoid basis,
    # rows half.. the cos block (ops/attention._sinusoid_pos layout);
    # reorganize to per-head [dh, half] operands, lane-padded to Dp2
    wrh = wr.astype(bf).reshape(D, H, dh)
    lanepad = ((0, 0), (0, 0), (0, Dp2 - half))
    ws = jnp.pad(jnp.transpose(wrh[:half], (1, 2, 0)), lanepad)
    wc = jnp.pad(jnp.transpose(wrh[half:2 * half], (1, 2, 0)), lanepad)

    # per-position tables cos(w_i t), sin(w_i t) for t in [0, Tp)
    inv = jnp.exp(-jnp.arange(0, D, 2, dtype=jnp.float32)
                  * (math.log(10000.0) / D))            # [half]
    ang = jnp.arange(Tp, dtype=jnp.float32)[:, None] * inv[None, :]
    zpad = ((0, 0), (0, Dp2 - half))
    cs = jnp.pad(jnp.cos(ang).astype(bf), zpad)
    sn = jnp.pad(jnp.sin(ang).astype(bf), zpad)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, T=T, Tp=Tp, dh=dh),
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
            pl.BlockSpec((H, dh, Dp2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, dh, Dp2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, Dp2), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, Dp2), lambda b: (0, 0),
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
    )(lengths.astype(jnp.int32), qp, kp, vp, ws, wc, cs, sn, u3, vb3)
    return out[:, :, :T]


def flash_ref(q: jax.Array, k: jax.Array, v: jax.Array,
              wr: jax.Array, u: jax.Array, vb: jax.Array,
              lengths: jax.Array, out_f32: bool = False) -> jax.Array:
    """Pure-XLA twin of the kernel math — the SAME factorized-sinusoid
    formulation (angle-addition matmuls, bf16 operands, f32 accumulate,
    f32 softmax), so like the kernel it never materializes a
    [B, H, T, 2T-1] rel-shift tensor. Differences from the kernel are
    f32/bf16 rounding only.

    Two jobs: (a) the recompute function for the custom_vjp backward —
    its VJP is the flash path's gradient; (b) an interpret-free
    correctness oracle for the kernel.

    MXU-dtype emulation: operands are ROUNDED to bf16 then fed to the
    contractions as f32 (`_mx` below) — numerically identical to the
    TPU's bf16xbf16->f32 MXU dot, and portable to CPU XLA, whose
    DotThunk rejects bf16 operands with an f32 preferred type."""
    B, H, T, dh = q.shape
    D = H * dh
    half = D // 2
    bf = jnp.bfloat16
    f32 = jnp.float32
    _mx = lambda a: a.astype(bf).astype(f32)         # bf16 rounding, f32 dot
    scale = np.float32(1.0 / math.sqrt(dh))
    qb, kb, va = q.astype(bf), k.astype(bf), v.astype(bf)
    qu = _mx(qb + u.astype(bf)[None, :, None, :])
    qv = _mx(qb + vb.astype(bf)[None, :, None, :])
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, _mx(kb))
    wrh = wr.astype(bf).reshape(D, H, dh)
    ws = jnp.transpose(wrh[:half], (1, 2, 0))        # [H, dh, half]
    wc = jnp.transpose(wrh[half:2 * half], (1, 2, 0))
    us = jnp.einsum("bhtd,hdf->bhtf", qv, _mx(ws))
    uc = jnp.einsum("bhtd,hdf->bhtf", qv, _mx(wc))
    inv = jnp.exp(-jnp.arange(0, D, 2, dtype=f32)
                  * (math.log(10000.0) / D))         # [half]
    ang = jnp.arange(T, dtype=f32)[:, None] * inv[None, :]
    cs = jnp.cos(ang).astype(bf)                     # [T, half]
    sn = jnp.sin(ang).astype(bf)
    snf, csf = sn.astype(f32), cs.astype(f32)
    A = _mx(us.astype(bf) * sn[None, None]
            + uc.astype(bf) * cs[None, None])        # query-indexed
    Bm = _mx(uc.astype(bf) * sn[None, None]
             - us.astype(bf) * cs[None, None])
    bd = (jnp.einsum("bhtf,sf->bhts", A, csf)
          + jnp.einsum("bhtf,sf->bhts", Bm, snf))
    scores = (ac + bd) * scale
    valid = jnp.arange(T)[None, :] < lengths[:, None]      # keys
    scores = jnp.where(valid[:, None, None, :], scores, NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", _mx(attn), _mx(va))
    return out if out_f32 else out.astype(bf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_core(out_f32, interpret, q, k, v, wr, u, vb, lengths):
    return _flash_fwd_impl(out_f32, interpret, q, k, v, wr, u, vb,
                           lengths)


def _flash_core_fwd(out_f32, interpret, q, k, v, wr, u, vb, lengths):
    out = _flash_fwd_impl(out_f32, interpret, q, k, v, wr, u, vb,
                          lengths)
    return out, (q, k, v, wr, u, vb, lengths)


# largest [Bc, H, T, T] f32 score transient the recompute backward may
# materialize at once; batches above it run the bwd in lax.map chunks
_BWD_SCORE_BYTES = 48 * 2**20


def _flash_core_bwd(out_f32, interpret, res, g):
    """Recompute backward: VJP of flash_ref at the saved primals.

    flash_ref is the factorized form, so the backward — like the
    forward — never touches a [B, H, T, 2T-1] tensor; XLA differentiates
    a plain matmul/softmax chain whose largest transient is the
    [B, H, T, T] score tile. At conformer_l scale (B=64 H=8 T'=300:
    184 MB f32) one fused bwd blew up the remote compile helper
    (r5 probe: HTTP 500, conformer_s compiled fine), so batches whose
    score tile exceeds _BWD_SCORE_BYTES run the VJP under lax.map over
    batch chunks — weight grads sum across chunks in f32, q/k/v grads
    concatenate; identical math, bounded transients."""
    q, k, v, wr, u, vb, lengths = res
    B, H, T, dh = q.shape
    gc_ = g.astype(jnp.float32) if out_f32 else g.astype(jnp.bfloat16)

    def pull_chunk(qc, kc, vc, lc, gcc):
        _, pull = jax.vjp(
            lambda q_, k_, v_, wr_, u_, vb_: flash_ref(
                q_, k_, v_, wr_, u_, vb_, lc, out_f32=out_f32),
            qc, kc, vc, wr, u, vb)
        return pull(gcc)

    score_bytes = B * H * T * T * 4
    nchunks = min(B, max(1, -(-score_bytes // _BWD_SCORE_BYTES)))
    while B % nchunks:
        nchunks += 1
    if nchunks == 1:
        dq, dk, dv, dwr, du, dvb = pull_chunk(q, k, v, lengths, gc_)
    else:
        Bc = B // nchunks
        resh = lambda a: a.reshape((nchunks, Bc) + a.shape[1:])
        outs = lax.map(
            lambda args: pull_chunk(*args),
            (resh(q), resh(k), resh(v), resh(lengths), resh(gc_)))
        dq, dk, dv = (o.reshape((B,) + o.shape[2:]) for o in outs[:3])
        dwr, du, dvb = (o.astype(jnp.float32).sum(0) for o in outs[3:])
    dlen = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dwr.astype(wr.dtype), du.astype(u.dtype),
            dvb.astype(vb.dtype), dlen)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("out_f32", "interpret"))
def flash_mhsa_rel(q: jax.Array, k: jax.Array, v: jax.Array,
                   wr: jax.Array, u: jax.Array, vb: jax.Array,
                   lengths: jax.Array,
                   out_f32: bool = False,
                   interpret: bool = False) -> jax.Array:
    """q/k/v: [B, H, T, dh] (any float dtype; cast to bf16 inside),
    wr: [D, D] rel-pos projection (D = H*dh; applied to the sinusoid
    basis INSIDE the kernel via the factorized identity), u/vb: [H, dh]
    content/position biases, lengths: [B] int32 valid key counts (pass
    jnp.full((B,), T) for unmasked). Returns [B, H, T, dh] (f32 when
    out_f32 else bf16).

    DIFFERENTIABLE (r5): jax.grad flows through via a custom_vjp whose
    backward is the VJP of flash_ref (XLA recompute of the identical
    factorized math) — fast flash forward, correct grads, no O(T^2)
    HBM tensor in either direction.
    """
    B, H, T, dh = q.shape
    assert wr.shape[0] == H * dh
    return _flash_core(out_f32, interpret, q, k, v, wr, u, vb, lengths)


def flash_eligible(T: int, dh: int, D: int) -> bool:
    """VMEM budget: the per-head [Tp, Tp] f32 score tile plus the
    [Tp, Dp2] factorization temporaries must fit alongside the
    [1, H, Tp, dh] blocks; T <= 1024 keeps the transient set well
    under the 64 MB allowance. D must split into sin/cos halves."""
    return 2 <= T <= 1024 and dh <= 128 and D % 2 == 0
