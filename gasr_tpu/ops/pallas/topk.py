"""Exact, stable top-k as a Pallas TPU kernel.

`lax.top_k` costs ~1 ms/frame at the decoder's flagship shape
([256, 4700], k=100) — the single largest piece of the beam-search
frame. Mosaic lowers neither sort nor top_k nor cumsum nor scatter
(probed; CLAUDE.md), so this kernel builds selection from primitives
that DO lower:

  1. order-preserving float->uint32 bit map (lax.bitcast + mask flip);
  2. exact k-th-largest threshold via 32-step binary search on the bit
     pattern (per-row, vectorized compare+count);
  3. tie handling: elements equal to the threshold are admitted in
     index order up to the remaining quota (matches lax.top_k's stable
     tie-break exactly);
  4. compaction of the k winners into 128 slots: positions from a
     chunked lower-triangular-matmul cumsum (MXU), then a chunked
     one-hot-compare einsum (MXU) — no scatter;
  5. final value ordering: in-register bitonic sort of the 128 slots on
     the composite key (u_hi, u_lo, -index), partner exchange via
     reshape/concat lane swaps — no sort primitive.

Requires k <= 128 (the decoder's W=100 fits; callers fall back to
lax.top_k otherwise). Returns (values, indices) bit-identical to
lax.top_k (validated in tests incl. tie cases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128
_SORT_N = 128


def _monotone_bits(x: jax.Array) -> jax.Array:
    """f32 -> uint32 with the same total order (ascending)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    top = u >= jnp.uint32(0x80000000)
    return jnp.where(top, ~u, u | jnp.uint32(0x80000000))


def _inverse_monotone_bits(u: jax.Array) -> jax.Array:
    top = u >= jnp.uint32(0x80000000)
    orig = jnp.where(top, u & jnp.uint32(0x7FFFFFFF), ~u)
    return lax.bitcast_convert_type(orig, jnp.float32)


def _cumsum_chunked(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last dim (multiple of _CHUNK) using
    lower-triangular matmuls — no cumsum primitive needed."""
    B, N = x.shape
    C = N // _CHUNK
    xr = x.reshape(B, C, _CHUNK)
    lt = (lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0) <=
          lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
          ).astype(jnp.float32)
    within = jax.lax.dot_general(
        xr, lt, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [B, C, CHUNK]
    totals = within[:, :, _CHUNK - 1:_CHUNK][:, :, 0]  # [B, C]
    # (static positive slice — a bare -1 index lowers to dynamic_slice,
    # which Mosaic does not implement)
    slt = (lax.broadcasted_iota(jnp.int32, (C, C), 0) <
           lax.broadcasted_iota(jnp.int32, (C, C), 1)).astype(jnp.float32)
    carry = jax.lax.dot_general(
        totals, slt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [B, C]
    return (within + carry[:, :, None]).reshape(B, N)


def _bitonic_sort_desc(hi, lo, idx):
    """Bitonic sort of the last dim (= _SORT_N, power of two) descending
    by key (hi, lo) with ascending index tie-break. Payloads are f32
    arrays holding exact small ints. Partner exchange via reshape+concat
    lane swaps (no sort/gather primitives)."""
    n = hi.shape[-1]
    lanes = lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
    log_n = int(np.log2(n))

    def swap_partner(x, d):
        # partner[i] = x[i ^ d] via two static shifts + lane select
        # (reshape-axis swaps fail to lower in Mosaic; slices+concat do)
        zeros = jnp.zeros_like(x[:, :d])
        left = jnp.concatenate([x[:, d:], zeros], axis=1)    # x[i + d]
        right = jnp.concatenate([zeros, x[:, :-d]], axis=1)  # x[i - d]
        low = (lanes & d) == 0
        return jnp.where(low, left, right)

    for kk in range(1, log_n + 1):
        # direction per lane: 0 => keep larger at the lower lane
        # (descending run), alternating by block of size 2^(kk)
        asc = ((lanes >> kk) & 1) == 1
        for j in range(kk - 1, -1, -1):
            d = 1 << j
            p_hi = swap_partner(hi, d)
            p_lo = swap_partner(lo, d)
            p_idx = swap_partner(idx, d)
            is_lower = (lanes & d) == 0
            # "a" = this lane, "b" = partner; compute a > b by composite
            gt = ((hi > p_hi) | ((hi == p_hi) & (lo > p_lo))
                  | ((hi == p_hi) & (lo == p_lo) & (idx < p_idx)))
            # descending block: lower lane keeps the larger
            keep_self = jnp.where(asc, gt != is_lower, gt == is_lower)
            hi = jnp.where(keep_self, hi, p_hi)
            lo = jnp.where(keep_self, lo, p_lo)
            idx = jnp.where(keep_self, idx, p_idx)
    return hi, lo, idx


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, n_valid: int):
    x = x_ref[:]                                      # [Bt, N] f32 (padded)
    Bt, N = x.shape
    lanes = lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    valid = lanes < n_valid
    u = jnp.where(valid, _monotone_bits(x), jnp.uint32(0))

    # ---- exact k-th largest threshold: 32-step bit binary search
    th = jnp.zeros((Bt, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        trial = th | (jnp.uint32(1) << bit)
        cnt = jnp.sum((u >= trial).astype(jnp.int32), axis=1,
                      keepdims=True)
        th = jnp.where(cnt >= k, trial, th)

    mask_gt = (u > th) & valid
    mask_eq = (u == th) & valid
    count_gt = jnp.sum(mask_gt.astype(jnp.int32), axis=1, keepdims=True)
    quota = k - count_gt                               # [Bt, 1]
    eq_cum = _cumsum_chunked(mask_eq.astype(jnp.float32))
    eq_rank = eq_cum - mask_eq.astype(jnp.float32)     # exclusive
    sel = mask_gt | (mask_eq & (eq_rank < quota.astype(jnp.float32)))

    # ---- compaction into _SORT_N slots (positions by index order)
    sel_f = sel.astype(jnp.float32)
    pos = _cumsum_chunked(sel_f) - sel_f               # exclusive, [Bt, N]
    # uint32->f32 converts don't lower; bitcast to int32 (values < 2^16,
    # sign-safe) then int->float convert (which does lower)
    u_hi = lax.bitcast_convert_type(u >> 16, jnp.int32).astype(jnp.float32)
    u_lo = lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    idx_f = lanes.astype(jnp.float32)
    payload = jnp.stack([u_hi, u_lo, idx_f], axis=-1)  # [Bt, N, 3]

    C = N // _CHUNK
    slots = lax.broadcasted_iota(
        jnp.int32, (Bt, _CHUNK, _SORT_N), 2).astype(jnp.float32)
    acc = jnp.zeros((Bt, _SORT_N, 3), jnp.float32)
    for c in range(C):
        s = c * _CHUNK
        pos_c = pos[:, s:s + _CHUNK]
        sel_c = sel_f[:, s:s + _CHUNK]
        oh = ((pos_c[:, :, None] == slots) *
              sel_c[:, :, None])                       # [Bt, CHUNK, SORT]
        acc = acc + jax.lax.dot_general(
            oh, payload[:, s:s + _CHUNK, :],
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [Bt, SORT, 3]

    hi = acc[:, :, 0]
    lo = acc[:, :, 1]
    idx = acc[:, :, 2].astype(jnp.int32)
    # empty slots (pos >= k) have payload 0 => u=0 => sort to the end
    hi, lo, idx = _bitonic_sort_desc(hi, lo, idx)

    hi_u = lax.bitcast_convert_type(hi.astype(jnp.int32), jnp.uint32)
    lo_u = lax.bitcast_convert_type(lo.astype(jnp.int32), jnp.uint32)
    u_sorted = (hi_u << 16) | lo_u
    vals = _inverse_monotone_bits(u_sorted)
    vals_ref[:] = vals
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_b", "interpret"))
def pallas_topk(x: jax.Array, k: int, block_b: int = 64,
                interpret: bool = False):
    """Exact stable top-k: (values [B, k], indices [B, k]) — bit-equal
    to lax.top_k(x, k). Requires k <= 128."""
    if k > _SORT_N:
        return lax.top_k(x, k)
    B, N = x.shape
    n_pad = (-N) % _CHUNK
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
    Np = N + n_pad
    b_pad = (-B) % block_b
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0)))
    Bp = B + b_pad

    grid = (Bp // block_b,)
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, n_valid=N),
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, Np), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_b, _SORT_N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, _SORT_N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, _SORT_N), jnp.float32),
            jax.ShapeDtypeStruct((Bp, _SORT_N), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return vals[:B, :k], idx[:B, :k]
